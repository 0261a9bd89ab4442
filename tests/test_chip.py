"""Per-chip kernel budget table (ops/chip.py) and its effect on the block
pickers (VERDICT round 2, Weak #8: v5e-swept constants silently applied to
other generations)."""

import numpy as np
import pytest

from diffusionkit_tpu.ops import chip
from diffusionkit_tpu.ops.flash_attention import pick_flash_blocks
from diffusionkit_tpu.ops.w4a8_matmul import pick_m_block


@pytest.fixture
def clear_cache():
    chip.current_spec.cache_clear()
    yield
    chip.current_spec.cache_clear()


def test_spec_detection_strings():
    assert chip.spec_for_kind("TPU v5 lite").name == "v5e"
    assert chip.spec_for_kind("TPU v5e").name == "v5e"
    assert chip.spec_for_kind("TPU v5p").name == "v5p"
    assert chip.spec_for_kind("TPU v6 lite").name == "v6e"
    assert chip.spec_for_kind("TPU v6e").name == "v6e"
    assert chip.spec_for_kind("TPU v4").name == "v4"
    assert chip.spec_for_kind("Tesla V100").name == "unknown"


def test_v5e_budgets_unchanged(monkeypatch):
    """The measured v5e block choices must not move (no behavior change)."""
    monkeypatch.delenv("DIFFUSIONKIT_TPU_VMEM_SCALE", raising=False)
    monkeypatch.delenv("DIFFUSIONKIT_TPU_FLASH_QBLK", raising=False)
    monkeypatch.setattr(chip, "current_spec", lambda: chip.spec_for_kind("v5 lite"))
    # Round-2 on-chip sweep results (single-tile kv at headline shapes).
    q, kv = pick_flash_blocks(1178, 64)
    assert kv == 1280 and q * kv <= 2_250_000 and 1280 % q == 0
    q, kv = pick_flash_blocks(4352, 128)
    assert kv == 4352 and 4352 % q == 0
    # Long sequences fall back to the swept streaming tiles on v5e
    # (tools/sweep_flash_long.py at the FLUX 2048² joint shape: 1024/1024 =
    # 36.1 ms/layer vs 41.1 at the untuned 512/1024).
    assert pick_flash_blocks(16640, 128) == (1024, 1024)
    assert pick_m_block(4352, 1024, 512) == 1088


def test_v6e_budget_scales(monkeypatch):
    """A 2x-VMEM chip admits single-tile kv at longer sequences and larger
    M blocks — the pickers must consult the chip table, not constants."""
    monkeypatch.delenv("DIFFUSIONKIT_TPU_FLASH_QBLK", raising=False)
    monkeypatch.setattr(chip, "current_spec", lambda: chip.spec_for_kind("v6e"))
    q, kv = pick_flash_blocks(8192, 128)  # > v5e 6144 single-kv cap
    assert kv == 8192, (q, kv)
    assert pick_m_block(4352, 1024, 512) > 1088


def test_env_scale_override(monkeypatch, clear_cache):
    monkeypatch.setenv("DIFFUSIONKIT_TPU_VMEM_SCALE", "0.5")
    assert chip.scale_budget(1000) == 500
    monkeypatch.delenv("DIFFUSIONKIT_TPU_VMEM_SCALE")
    assert chip.scale_budget(1000) == int(1000 * chip.current_spec().vmem_scale)
