"""Contract-shape guards for the grading driver's canonicalizer.

The real driver lexsorts every result column in pandas; list/array
cells are unhashable there and fail the gate even when the engine is
correct (round-2 red row `evidence_excerpts`). tools/driver_check.py
must therefore REJECT non-scalar columns, never coerce them — these
tests pin that behavior so replica-pass ≠ driver-fail can't recur.
"""

import numpy as np
import pandas as pd
import pytest

from tools.driver_check import NonScalarColumnError, normalize


def test_list_column_rejected():
    df = pd.DataFrame({"doc_id": [1, 2], "excerpts": [["a", "b"], ["c"]]})
    with pytest.raises(NonScalarColumnError):
        normalize(df)


def test_numpy_array_column_rejected():
    # Spark toPandas renders array<T> columns as numpy arrays
    df = pd.DataFrame(
        {"doc_id": [1], "sig": [np.array([1, 2, 3], dtype=np.int64)]}
    )
    with pytest.raises(NonScalarColumnError):
        normalize(df)


def test_dict_column_rejected():
    df = pd.DataFrame({"doc_id": [1], "meta": [{"k": "v"}]})
    with pytest.raises(NonScalarColumnError):
        normalize(df)


def test_scalar_columns_pass():
    df = pd.DataFrame(
        {
            "doc_id": [2, 1],
            "score": [1.23456789012, 0.5],
            "name": ["b", None],
        }
    )
    out = normalize(df)
    assert list(out.columns) == ["doc_id", "name", "score"]
    assert len(out) == 2


# The grading driver runs only the FIRST 50 queries() entries (round-3
# verdict #1: four green entries silently fell off the graded set).
# These constants are the curated layout; change them deliberately and
# update README.md / ROUND4.md counts in the same commit.
GRADED_CAP = 50
EXPECTED_TOTAL = 80


def test_gate_layout_full_oracle_first():
    """Zone layout: every key with an oracle_sql() twin precedes every
    key without one is NOT required — but the first GRADED_CAP keys
    must ALL have full-oracle twins, and every rows-only key must sit
    past the cap. Also pins the documented entry count."""
    import __spark_entry__ as entrymod

    qkeys = list(entrymod.queries().keys())
    okeys = set(entrymod.oracle_sql().keys())
    assert len(qkeys) == EXPECTED_TOTAL, (
        f"queries() has {len(qkeys)} entries; update EXPECTED_TOTAL and "
        "the README/ROUND entry-count lines together"
    )
    assert len(qkeys) == len(set(qkeys))
    graded = qkeys[:GRADED_CAP]
    missing = [k for k in graded if k not in okeys]
    assert not missing, f"graded slots without an oracle twin: {missing}"
    rows_only = [k for k in qkeys if k not in okeys]
    late = [k for k in rows_only if qkeys.index(k) < GRADED_CAP]
    assert not late, f"rows-only entries inside the graded 50: {late}"


def test_all_gate_entries_are_scalar_shaped(spark):
    """Every queries() entry must produce a flat (non-array, non-map,
    non-struct) schema — checked statically from the analyzed plan at
    sf0.001, no execution needed beyond planning."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    bad = []
    for name, fn in entrymod.queries().items():
        schema = fn(spark, sf_dir).schema
        for field in schema.fields:
            tn = field.dataType.typeName()
            if tn in ("array", "map", "struct"):
                bad.append(f"{name}.{field.name}: {tn}")
    assert not bad, f"non-scalar gate columns: {bad}"
