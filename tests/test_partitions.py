"""Property tests for the hierarchical partition planner — ports the
reference's hypothesis suite in spirit (tests/test_partitioning.py:17-62):
totality, gap-freedom, monotone non-increasing sizes; plus the golden
31-partition plan from the reference's integration fixture."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from subgraph_extractor_spark.plans.partitions import (
    Partition,
    get_partitions,
    plan_delta,
)


@st.composite
def size_stack(draw):
    """Multiplicative size stacks, like the reference's test helper
    (tests/test_partitioning.py:7-14)."""
    base = draw(st.integers(min_value=1, max_value=64))
    factors = draw(
        st.lists(st.integers(min_value=2, max_value=16), min_size=0, max_size=4)
    )
    sizes = [base]
    for f in factors:
        sizes.append(sizes[-1] * f)
    return sorted(sizes, reverse=True)


@st.composite
def planner_inputs(draw):
    sizes = draw(size_stack())
    start = draw(st.integers(min_value=0, max_value=10**9))
    span = draw(st.integers(min_value=0, max_value=10**7))
    return start, start + span, sizes


@given(planner_inputs())
@settings(max_examples=200, deadline=None)
def test_cover_is_contiguous_and_gap_free(inp):
    start, end, sizes = inp
    cover = get_partitions(start, end, sizes)
    for a, b in zip(cover, cover[1:]):
        assert a.end == b.start  # contiguous, non-overlapping, gap-free
    for p in cover:
        assert p.end - p.start == p.size
        assert p.start % p.size == 0  # size-aligned


@given(planner_inputs())
@settings(max_examples=200, deadline=None)
def test_cover_total_over_complete_range(inp):
    start, end, sizes = inp
    cover = get_partitions(start, end, sizes)
    smallest = min(sizes)
    complete_end = (end // smallest) * smallest
    if cover:
        # cover reaches from an aligned point at/below start to the last
        # complete smallest-aligned boundary; the incomplete tail is excluded
        assert cover[0].start <= start
        assert cover[-1].end == complete_end
    else:
        aligned_start = min((start // s) * s for s in sizes)
        assert complete_end <= aligned_start or complete_end <= start


@given(planner_inputs())
@settings(max_examples=200, deadline=None)
def test_sizes_monotonically_non_increasing(inp):
    start, end, sizes = inp
    cover = get_partitions(start, end, sizes)
    got = [p.size for p in cover]
    assert got == sorted(got, reverse=True)


def test_reference_golden_31_partitions():
    """Reference fixture: blocks 18.0M-19.0M, sizes [524288,32768,1024]
    -> 31 partitions, first aligned below earliest (empty-prefix file)."""
    cover = get_partitions(18_000_000, 19_000_000, [524288, 32768, 1024])
    assert len(cover) == 31
    assert cover[0] == Partition(524288, 17_825_792, 18_350_080)
    assert cover[-1].end == (19_000_000 // 1024) * 1024


def test_invalid_sizes_rejected():
    with pytest.raises(ValueError):
        get_partitions(0, 100, [12, 5])  # 5 does not divide 12
    with pytest.raises(ValueError):
        get_partitions(0, 100, [])
    with pytest.raises(ValueError):
        get_partitions(0, 100, [0])


def test_plan_delta_incremental_and_recoarsening():
    sizes = [1024 * 16, 1024]
    old = get_partitions(0, 20_000, sizes)
    new = get_partitions(0, 40_000, sizes)
    delta = plan_delta(old, new)
    assert set(new) - set(old) == set(delta)
    # re-coarsening: the grown range is now covered by 16k partitions that
    # supersede old 1k ones; those large partitions must be in the delta
    large = [p for p in delta if p.size == 1024 * 16]
    assert large, "expected re-coarsened large partitions in the delta"
    # and the new cover no longer references the superseded small ones
    superseded = [p for p in old if p.size == 1024 and p.end <= 32768]
    assert all(p not in new for p in superseded)
