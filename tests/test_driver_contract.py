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
