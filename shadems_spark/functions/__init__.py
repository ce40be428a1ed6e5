"""Scalar function surface of the engine (SURVEY.md §2 SF/B)."""

from shadems_spark.functions.complexops import (  # noqa: F401
    cpx,
    c_re,
    c_im,
    c_amp,
    c_phase_deg,
    c_add,
    c_sub,
    c_mul,
    c_div,
)
