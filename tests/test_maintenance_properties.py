"""Property tests for the maintenance primitives.

zorder_key is pure bit arithmetic — the exact kind of code where a
single-off-by-one survives example tests; hypothesis drives it across the
full domain against an independent Python reference.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_pipeline_spark.operators.maintenance import zorder_key


def _py_zorder(vals: list[int], bits: int) -> int:
    z = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            z += ((v >> i) & 1) << (i * n + j)
    return z


@settings(max_examples=6, deadline=None)  # each example is a Spark job
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),
            st.integers(min_value=0, max_value=1 << 40),
            st.integers(min_value=0, max_value=1 << 40),
        ),
        min_size=1,
        max_size=8,
    ),
    bits=st.sampled_from([4, 8, 16]),
)
def test_zorder_matches_reference(spark, rows, bits):
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = [
        r.z
        for r in df.withColumn("z", zorder_key(["a", "b", "c"], bits=bits))
        .orderBy("a", "b", "c")
        .collect()
    ]
    want = [_py_zorder(list(t), bits) for t in sorted(rows)]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=(1 << 16) - 1),
    b=st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_zorder_locality_bound(a, b):
    """Morton keys of equal points are equal, and flipping one low bit of
    one dimension changes the key by at most that bit's interleaved
    weight — the property that makes z-ranges cluster neighborhoods."""
    base = _py_zorder([a, b], 16)
    assert _py_zorder([a, b], 16) == base
    flipped = _py_zorder([a ^ 1, b], 16)
    assert abs(flipped - base) == 1 << 0 * 2  # bit 0 of dim 0 sits at z-bit 0
