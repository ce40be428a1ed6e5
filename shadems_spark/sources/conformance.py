"""MSSource backend conformance kit (VERDICT r4 #8): the executable
contract every :class:`~shadems_spark.sources.ms_adapter.MSSource`
implementation must pass — column contract, pruning, cube alignment,
subtable resolution, group discovery.

The point: :class:`CasacoreMS` can't run in this container (no
python-casacore), so its correctness story is this kit, not dead
skeleton code.  A backend implementer subclasses
:class:`MSSourceConformance` in their test module, binds
``self.source`` in an autouse fixture, and pytest collects every
``test_*`` method here against their backend — the same checks the
in-repo :class:`ParquetStandinMS` passes (tests/test_ms_conformance.py,
which also contains the env-gated CasacoreMS binding that activates
wherever casacore and a real MS exist).

Checks are backend-agnostic: plan-level assertions (scan pruning)
apply only when the physical plan exposes a ``ReadSchema`` (file-based
scans) and are skipped otherwise, so an in-memory or RPC backend isn't
failed for not being parquet.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: main() columns every backend must emit, with their Spark SQL types.
#: FIELD identification is polymorphic: FIELD_ID (bigint) or
#: FIELD_NAME (string) — the reference resolves names through the
#: FIELD subtable either way.
REQUIRED_MAIN = {
    "TIME": "double",
    "ANTENNA1": "bigint",
    "ANTENNA2": "bigint",
    "SCAN_NUMBER": "bigint",
    "DATA_DESC_ID": "bigint",
    "UVW": "array<double>",
    "FLAG": "array<boolean>",
    "FLAG_ROW": "boolean",
    "WEIGHT": "array<double>",
}

#: rows sampled for per-row shape assertions (bounded — conformance
#: must stay cheap on a 100 TB MS; shapes are homogeneous per MS).
SAMPLE_ROWS = 1000


def scan_read_columns(df: DataFrame) -> set[str] | None:
    """Output column names of the first file scan in the executed
    plan, or None when the backend has no file scan (the pruning check
    then only asserts the DataFrame-level projection).  Parsed from
    the ``FileScan fmt [col#0, ...]`` attribute list — the ReadSchema
    field is truncated by Spark's plan printer for wide scans, the
    bracket list is not (a very wide list ends in ``... N more
    fields``, which we expand into sentinel names so cardinality
    comparisons stay correct)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"FileScan \w+ \[([^\]]*)\]", plan)
    if not m:
        return None
    cols: set[str] = set()
    for part in m.group(1).split(","):
        part = part.strip()
        more = re.match(r"\.\.\. (\d+) more fields?", part)
        if more:
            cols |= {f"__more_{i}" for i in range(int(more.group(1)))}
        elif part:
            cols.add(part.split("#", 1)[0])
    return cols


class MSSourceConformance:
    """Subclass in a pytest module and bind ``self.source`` (an
    MSSource) in an autouse fixture; pytest runs every check below
    against that backend."""

    source = None  # bound by the subclass fixture

    # ---------------------------------------------------- main() contract

    def test_main_column_contract(self):
        types = dict(self.source.main().dtypes)
        for col, want in REQUIRED_MAIN.items():
            assert col in types, f"main() missing contract column {col}"
            assert types[col] == want or types[col].startswith(want), (
                f"main().{col}: got {types[col]}, contract says {want}"
            )
        assert "FIELD_ID" in types or "FIELD_NAME" in types, (
            "main() must identify fields via FIELD_ID or FIELD_NAME"
        )
        data_t = types.get("DATA", "")
        assert data_t.startswith("array<struct<re:double,im:double"), (
            f"main().DATA must be a flattened complex cube, got {data_t}"
        )

    def test_main_schema_stable_across_calls(self):
        a, b = self.source.main(), self.source.main()
        assert a.columns == b.columns and dict(a.dtypes) == dict(b.dtypes)

    def test_main_nonempty(self):
        assert self.source.main().limit(1).count() == 1

    # --------------------------------------------------------- pruning

    def test_main_projection_pruned(self):
        cols = ["TIME", "ANTENNA1"]
        pruned = self.source.main(columns=cols)
        assert pruned.columns == cols

    def test_main_pruning_reaches_scan(self):
        """A 2-column projection must not read the cube columns at the
        scan (file-scan backends only — the check that catches a
        backend materializing all of MAIN and projecting after)."""
        pruned = self.source.main(columns=["TIME", "ANTENNA1"])
        read = scan_read_columns(pruned)
        if read is None:
            return  # non-file backend: projection check above suffices
        full = scan_read_columns(self.source.main())
        assert full is not None and len(read) < len(full), (
            f"pruned scan reads {sorted(read)} — no narrower than the "
            f"full-contract scan {sorted(full or set())}"
        )

    # --------------------------------------------------- cube alignment

    def test_cube_shapes_aligned(self):
        """Per row: UVW has 3 components; FLAG aligns 1:1 with DATA;
        WEIGHT is non-empty.  Asserted via a distributed violation
        count over a bounded sample — never a driver-side collect of
        cube cells."""
        from pyspark.sql import functions as F

        s = self.source.main().limit(SAMPLE_ROWS)
        bad = s.filter(
            (F.size("UVW") != 3)
            | (F.size("FLAG") != F.size("DATA"))
            | (F.size("WEIGHT") < 1)
        ).count()
        assert bad == 0, f"{bad} rows violate cube-shape alignment"

    # ------------------------------------------------------- subtables

    def test_subtables_resolve_nonempty(self):
        names = self.source.subtable_names()
        assert len(names) >= 5, f"expected the 5 MSInfo subtables, got {names}"
        for name in names:
            t = self.source.subtable(name)
            assert len(t.columns) > 0 and t.limit(1).count() == 1, (
                f"subtable {name} is empty or schemaless"
            )

    def test_unknown_subtable_raises(self):
        import pytest

        with pytest.raises(KeyError):
            self.source.subtable("NO_SUCH_SUBTABLE")

    # -------------------------------------------------- group discovery

    def test_group_discovery(self):
        """The reference iterates (DDID, field, scan) groups; a backend
        must expose at least one non-empty group and every DATA_DESC_ID
        must be a valid subtable-resolvable id (non-negative)."""
        from pyspark.sql import functions as F

        groups = (
            self.source.main(columns=["DATA_DESC_ID", "SCAN_NUMBER"])
            .groupBy("DATA_DESC_ID", "SCAN_NUMBER")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = groups.collect()
        assert len(rows) >= 1 and all(r["n"] > 0 for r in rows)
        assert all(r["DATA_DESC_ID"] >= 0 for r in rows)
