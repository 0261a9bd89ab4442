"""Per-chip kernel tuning parameters (VMEM budgets, block caps).

Round-2 kernels hard-coded VMEM/score budgets swept on the v5e this box
exposes; v5p/v6e would silently inherit v5e block choices (VERDICT round 2,
Weak #8). This table keys the budgets by detected device kind — alongside
the peak-FLOPs table in flops.py — so other generations get explicit
(documented) values and a new sweep only has to update one row.

Values are the usable fractions found empirically on v5e (Mosaic fits a
single ~9 MB f32 score buffer; ~13 MB total working set), scaled by each
generation's architectural VMEM. v5p shares the v5e 16 MiB/core-class VMEM;
Trillium (v6e) doubled on-chip vector memory per the public spec. Unswept
generations keep the v5e-proven FRACTIONS of their VMEM so choices stay
conservative; `DIFFUSIONKIT_TPU_VMEM_SCALE` overrides the multiplier for
on-chip sweeps.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    # Multiplier applied to the v5e-swept VMEM-derived budgets. 1.0 keeps
    # the measured v5e numbers bit-for-bit.
    vmem_scale: float


_CHIPS = {
    # device_kind substring (lowercased) -> spec. Order matters: first match.
    "v5 lite": ChipSpec("v5e", 1.0),
    "v5e": ChipSpec("v5e", 1.0),
    "v5p": ChipSpec("v5p", 1.0),   # same 16 MiB-class VMEM as v5e
    "v6 lite": ChipSpec("v6e", 2.0),  # Trillium: doubled on-chip memory
    "v6e": ChipSpec("v6e", 2.0),
    "v4": ChipSpec("v4", 1.0),
}

_DEFAULT = ChipSpec("unknown", 1.0)


def spec_for_kind(device_kind: str) -> ChipSpec:
    s = device_kind.lower()
    for key, spec in _CHIPS.items():
        if key in s:
            return spec
    return _DEFAULT


@functools.lru_cache(maxsize=1)
def current_spec() -> ChipSpec:
    try:
        import jax

        return spec_for_kind(jax.devices()[0].device_kind)
    except Exception:  # pragma: no cover - no backend at all
        return _DEFAULT


def vmem_scale() -> float:
    """Budget multiplier for the current chip (env-overridable for sweeps)."""
    env = os.environ.get("DIFFUSIONKIT_TPU_VMEM_SCALE")
    if env:
        return float(env)
    return current_spec().vmem_scale


def scale_budget(v5e_budget: int) -> int:
    """Scale a v5e-swept byte/element budget to the current chip."""
    return int(v5e_budget * vmem_scale())


def hbm_scale() -> float:
    """Ratio of this chip's HBM to the 16 GB v5e the HBM-derived budgets
    (e.g. the denoise batch auto-split) were sized on. Env-overridable
    (DIFFUSIONKIT_TPU_HBM_SCALE); never below 1 so v5e-swept behaviour is
    the floor."""
    env = os.environ.get("DIFFUSIONKIT_TPU_HBM_SCALE")
    if env:
        return float(env)
    try:
        import jax

        limit = jax.local_devices()[0].memory_stats().get("bytes_limit")
        if limit:
            return max(1.0, float(limit) / 16e9)
    except Exception:  # pragma: no cover - CPU/no stats
        pass
    return 1.0
