"""``python -m shadems_spark`` — the shadems-equivalent entry point
([R] setup.py console_scripts shadems = shade_ms.main:main)."""

from shadems_spark.cli import run

if __name__ == "__main__":
    for path in run():
        print(path)
