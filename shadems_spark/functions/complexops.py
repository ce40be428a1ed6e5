"""Complex arithmetic over struct<re,im> columns.

Spark has no complex dtype; the engine's convention (SURVEY.md §1.2)
is ``struct(re double, im double)`` applied with total consistency via
these helpers.  They mirror the reference's mapper lambdas
([R] shade_ms/data_mappers.py::data_mappers — amp, phase, real, imag)
and the DataAxis column-arithmetic grammar ``DATA-MODEL_DATA`` etc.
([R] shade_ms/data_mappers.py::DataAxis, SURVEY.md §2 P2-P5).

All pure Column expressions — JVM-side, whole-stage-codegen friendly,
no UDFs.  ``sqrt(re²+im²)`` is used instead of ``hypot`` so the oracle
SQL can use the bit-identical formula in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def cpx(re: Column | str, im: Column | str) -> Column:
    """Pack (re, im) into the engine's complex struct."""
    return F.struct(_c(re).cast("double").alias("re"), _c(im).cast("double").alias("im"))


def c_re(c: Column) -> Column:
    return c.getField("re")


def c_im(c: Column) -> Column:
    return c.getField("im")


def c_amp(c: Column) -> Column:
    """|z| — [R] data_mappers.py mapper 'amp'."""
    re, im = c_re(c), c_im(c)
    return F.sqrt(re * re + im * im)


def c_phase_deg(c: Column) -> Column:
    """angle(z) in degrees — [R] data_mappers.py mapper 'phase'."""
    return F.degrees(F.atan2(c_im(c), c_re(c)))


def c_add(a: Column, b: Column) -> Column:
    return cpx(c_re(a) + c_re(b), c_im(a) + c_im(b))


def c_sub(a: Column, b: Column) -> Column:
    """Residual DATA-MODEL_DATA ([R] DataAxis '-' grammar)."""
    return cpx(c_re(a) - c_re(b), c_im(a) - c_im(b))


def c_mul(a: Column, b: Column) -> Column:
    return cpx(
        c_re(a) * c_re(b) - c_im(a) * c_im(b),
        c_re(a) * c_im(b) + c_im(a) * c_re(b),
    )


def c_div(a: Column, b: Column) -> Column:
    """a/b via conjugate formula: a*conj(b) / |b|²."""
    den = c_re(b) * c_re(b) + c_im(b) * c_im(b)
    return cpx(
        (c_re(a) * c_re(b) + c_im(a) * c_im(b)) / den,
        (c_im(a) * c_re(b) - c_re(a) * c_im(b)) / den,
    )
