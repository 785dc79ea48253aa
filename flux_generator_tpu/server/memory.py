"""Resident-set memory planner for the serving slot cache (VERDICT r2 #5).

The reference keeps one flux + one SD pipeline slot with no memory
accounting at all (flux_app.py:64-88) — workable in Apple unified memory,
not on a 16 GB v5e chip where flux int8 (≈14.8 GB resident) plus SDXL bf16
(≈7 GB) cannot co-reside. This planner decides, BEFORE each load:

  1. the weight policy of the incoming pipeline — the ladder is
     bf16 → int8 (per-channel weight-only) → int4 (group-128 nibble-packed,
     flux only; the Pallas unpack-in-kernel matmul wins at the denoise's
     M ≥ 1024) — picking the HIGHEST precision whose steady-state resident
     set fits the HBM budget, and
  2. which resident slots to evict (LRU) if even the lowest tier doesn't.

Multi-model adaptation: the planner remembers every family that has been
requested ("pressure"). Non-resident pressured families reserve their
minimum-tier footprint in later plans, so after one adaptation cycle
(flux int8 evicted by the first SDXL request; the next flux request loads
at int4 beside it) alternating flux/SDXL requests pay ZERO reloads.
Servers that know their model mix up front can call `expect()` to skip the
adaptation reloads entirely.

Estimates come from a table of measured full-size parameter footprints;
after a load completes the estimate is replaced by the true sum of the
pipeline's device-buffer sizes, so the plan self-corrects for quantized/
tiny/mock pipelines.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional

# Measured/derived full-size parameter footprints (GB) by (family, policy).
# flux = 12B flow + 4.7B T5 + CLIP-L + VAE (T5 is int4-grouped under both
# int tiers, as benched); sd/sdxl = unet + clip(s) + vae with the int tier
# quantizing dense layers only (io/loaders._sd_quant_predicate — convs stay
# bf16, like the reference's Linear-only nn.quantize).
FOOTPRINTS_GB = {
    ("flux", "bf16"): 33.5,   # 24 flow + 9.5 T5 — never fits one v5e
    ("flux", "int8"): 14.8,   # 12.0 flow int8 + 2.5 T5 int4 + clip/vae bf16
    ("flux", "int4"): 9.8,    # 6.9 flow int4 g=128 (+scales) + same rest
    ("sd", "bf16"): 2.6,
    ("sd", "int8"): 1.6,
    ("sdxl", "bf16"): 7.1,
    ("sdxl", "int8"): 4.0,
    ("musicgen", "bf16"): 4.2,
    ("musicgen", "int8"): 2.4,
}

# policy ladders per family: SD's convs dominate past int8; musicgen int4
# loses at AR M=2 (NOTES r2) — only flux has a useful int4 tier
LADDERS = {
    "flux": ("bf16", "int8", "int4"),
    "sd": ("bf16", "int8"),
    "sdxl": ("bf16", "int8"),
    "musicgen": ("bf16", "int8"),
}

# transient head-room the compiled programs need on top of resident params
# (activations, dequant buffers, uint8 decode) — measured ≤ 1.0 GB at 1024²
# with flux int8 resident (BENCH_RESULTS.md resident-vs-peak rows)
TRANSIENT_GB = 1.0


def model_family(model: str) -> str:
    if model.startswith("stabilityai/"):
        return "sdxl" if "sdxl" in model else "sd"
    if "music" in model:
        return "musicgen"
    return "flux"


def device_hbm_gb() -> float:
    """Total HBM of device 0; 16 GB v5e fallback when the tunnel backend
    doesn't report memory_stats."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return limit / 1e9
    except Exception:  # noqa: BLE001 — tunnel backends may raise anything
        pass
    return 16.0


@dataclass
class _Slot:
    family: str
    model: str
    gb: float
    policy: str
    last_used: float = field(default_factory=time.monotonic)


@dataclass
class LoadPlan:
    policy: str             # "bf16" | "int8" | "int4" for the incoming load
    evict: List[str]        # slot names to drop before loading
    est_gb: float           # planned resident footprint of the new pipeline

    @property
    def quantize(self) -> bool:
        return self.policy != "bf16"


class MemoryPlanner:
    """Tracks per-slot resident footprints and plans loads against the HBM
    budget. Slot names are the FluxAPI cache slots ("flux", "sd",
    "musicgen")."""

    def __init__(self, budget_gb: Optional[float] = None,
                 transient_gb: float = TRANSIENT_GB):
        self.budget_gb = budget_gb if budget_gb is not None else device_hbm_gb()
        self.transient_gb = transient_gb
        self.slots: Dict[str, _Slot] = {}
        # families ever requested this process — non-resident ones reserve
        # their minimum-tier footprint so repeat visitors co-reside
        self.pressure: set = set()

    def expect(self, families: Iterable[str]) -> None:
        """Declare the model mix up front (e.g. server --warmup list) so the
        first loads already plan for co-residency."""
        self.pressure.update(families)

    # ------------------------------------------------------------ planning

    def _min_est(self, family: str) -> float:
        return min(self._estimate(family, p) for p in LADDERS[family])

    def plan(self, slot: str, model: str) -> LoadPlan:
        family = model_family(model)
        self.pressure.add(family)
        avail = self.budget_gb - self.transient_gb
        resident = {n: s for n, s in self.slots.items() if n != slot}
        resident_gb = sum(s.gb for s in resident.values())
        resident_fams = {s.family for s in resident.values()}
        # reservation for pressured families that aren't loaded right now
        reserve = sum(
            self._min_est(f) for f in self.pressure
            if f != family and f not in resident_fams
        )

        for policy in LADDERS[family]:
            if resident_gb + reserve + self._estimate(family, policy) <= avail:
                return LoadPlan(policy, [], self._estimate(family, policy))

        # lowest tier + reservation doesn't fit: retry without reserving for
        # absent families (they'll adapt when they come back)
        floor = LADDERS[family][-1]
        for policy in LADDERS[family]:
            if resident_gb + self._estimate(family, policy) <= avail:
                return LoadPlan(policy, [], self._estimate(family, policy))

        # still doesn't fit: evict other slots, least-recently-used first
        evict = []
        for name in sorted(resident, key=lambda n: resident[n].last_used):
            evict.append(name)
            resident_gb -= resident[name].gb
            if resident_gb + self._estimate(family, floor) <= avail:
                break
        return LoadPlan(floor, evict, self._estimate(family, floor))

    def _estimate(self, family: str, policy: str) -> float:
        return FOOTPRINTS_GB.get((family, policy),
                                 FOOTPRINTS_GB.get((family, "bf16"), 1.0))

    # ------------------------------------------------------------ tracking

    def note_load(self, slot: str, model: str, pipeline, policy: str) -> None:
        """Record a completed load; measure the REAL footprint from the
        pipeline's param buffers when available."""
        gb = self._measure(pipeline)
        if gb is None:
            gb = self._estimate(model_family(model), policy)
        self.slots[slot] = _Slot(model_family(model), model, gb, policy)

    def note_use(self, slot: str) -> None:
        if slot in self.slots:
            self.slots[slot].last_used = time.monotonic()

    def note_evict(self, slot: str) -> None:
        self.slots.pop(slot, None)

    @staticmethod
    def _measure(pipeline) -> Optional[float]:
        params = getattr(pipeline, "params", None)
        if params is None:
            return None
        try:
            import jax

            return sum(
                x.nbytes for x in jax.tree.leaves(params)
                if hasattr(x, "nbytes")
            ) / 1e9
        except Exception:  # noqa: BLE001
            return None
