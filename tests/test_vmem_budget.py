"""Unit tests for the Pallas VMEM budget selection (_pick_bz /
_validated_budget), including the large-plane escalation added for the
HR grid (stencil.py; measured +65% at HR on v5e).

These run entirely on CPU with fake compile probes — the on-chip
validation is the bench matrix itself.
"""

import pytest

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.ops.pallas import stencil as st


def geom(n1, n2, n3):
    return GridGeometry(0.03, 0.03, 0.06, n1, n2, n3)


MR = geom(100, 100, 200)
HR = geom(200, 200, 400)


@pytest.fixture(autouse=True)
def clear_cache():
    st._BUDGET_SCALE.clear()
    yield
    st._BUDGET_SCALE.clear()


class TestPickBz:
    def test_mr_default_budget_gives_deep_blocks(self):
        bz = st._pick_bz(MR, 4, "flat", buffers=2)
        assert bz >= 4

    def test_hr_default_budget_forces_single_plane(self):
        assert st._pick_bz(HR, 4, "flat", buffers=2) == 1

    def test_hr_escalated_budget_gives_multi_plane(self):
        bz = st._pick_bz(HR, 4, "flat", vmem_budget=96 * 2**20, buffers=2)
        assert bz >= 4

    def test_divisibility(self):
        for g in (MR, HR, geom(50, 50, 100)):
            for budget in (15 * 2**20, 96 * 2**20):
                bz = st._pick_bz(g, 4, "flat", vmem_budget=budget,
                                 buffers=2)
                assert g.n3 % bz == 0


class TestValidatedBudget:
    def test_no_escalation_when_default_blocks_are_deep(self):
        calls = []

        def probe(bz, lim):
            calls.append((bz, lim))

        budget, lim = st._validated_budget(MR, "flat", probe, "t1",
                                           buffers=2, escalate=True)
        assert lim == 0
        assert budget <= 15 * 2**20
        # every probe ran at the default Mosaic limit
        assert all(limit == 0 for _, limit in calls)

    def test_escalates_on_large_planes(self):
        def probe(bz, lim):
            pass  # everything compiles

        budget, lim = st._validated_budget(HR, "flat", probe, "t2",
                                           buffers=2, escalate=True)
        assert lim == 120
        assert budget == 96 * 2**20
        # and the pick at that budget is multi-plane
        assert st._pick_bz(HR, 4, "flat", vmem_budget=budget,
                           buffers=2) >= 4

    def test_escalation_tier_falls_back_on_compile_failure(self):
        def probe(bz, lim):
            if lim:  # escalated tiers fail to compile
                raise RuntimeError("scoped vmem overflow")

        budget, lim = st._validated_budget(HR, "flat", probe, "t3",
                                           buffers=2, escalate=True)
        assert lim == 0
        assert budget <= 15 * 2**20

    def test_escalate_false_never_raises_limit(self):
        def probe(bz, lim):
            assert lim == 0

        _, lim = st._validated_budget(HR, "flat", probe, "t4",
                                      buffers=2, escalate=False)
        assert lim == 0

    def test_default_path_halves_until_probe_passes(self):
        seen = []

        def probe(bz, lim):
            seen.append(bz)
            if bz > 2:
                raise RuntimeError("overflow")

        budget, lim = st._validated_budget(MR, "flat", probe, "t5",
                                           buffers=2, escalate=True)
        assert seen[-1] <= 2 and lim == 0
        assert st._pick_bz(MR, 4, "flat", vmem_budget=budget,
                           buffers=2) <= 2

    def test_result_cached_per_shape_kind(self):
        calls = []

        def probe(bz, lim):
            calls.append(bz)

        a = st._validated_budget(HR, "flat", probe, "t6", buffers=2)
        b = st._validated_budget(HR, "flat", probe, "t6", buffers=2)
        assert a == b
        assert len(calls) == 1

    def test_user_limit_not_served_escalated_cache(self):
        """A builder with an explicit vmem_limit_mb must not inherit an
        escalated (budget, limit) cached for the default limit: that
        combination was never probed and can hard-fail at compile
        (advisor r3)."""
        def probe(bz, lim):
            pass  # everything compiles

        a = st._validated_budget(HR, "flat", probe, "t7", buffers=2,
                                 escalate=True, user_limit_mb=0)
        assert a[1] > 0  # escalated tier kept (raised Mosaic limit)
        b = st._validated_budget(HR, "flat", probe, "t7", buffers=2,
                                 escalate=False, user_limit_mb=24)
        assert b != a  # distinct cache entry, no escalated leak
        assert b[1] == 0
