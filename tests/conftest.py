"""Test harness setup: force CPU with 8 virtual devices (the JAX-native
analogue of multi-node simulation, SURVEY.md §4) before jax initializes."""

import os
import sys

# the session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual CPU mesh, so force-override. The axon PJRT
# plugin force-registers itself regardless of the env var, so we must also
# pin the platform through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_ROOT = os.environ.get("RAYTRACER_REF_DATA", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "data"))


# ---- test tiers (VERDICT r3 #8) ----
# The full suite is ~15 min on the single shared CPU core — fine for
# nightly, hostile to the edit-test loop. Tests listed here are the heavy
# parity/bit-identity gates (each >=10 s: full render paths through the
# renderer, multi-second wavefront loops); they get the `slow` marker at
# collection so `pytest -m "not slow"` is a <3-min smoke tier (analytic
# units, interpret-Pallas, multichip/tiny shapes). Name-based so the gates
# themselves stay undecorated and grep-able.
SLOW_TESTS = {
    "test_device_ray_gen_is_bit_identical",
    "test_stage_modes_bit_identical",
    "test_golden_structural_cheap_always_on",
    "test_fetch_groups_overlap_is_bit_identical",
    "test_sharded_u32_encode_matches_single",
    "test_parity_medium_realistic",
    "test_autotune_picks_fastest_and_is_exact",
    "test_bench_multi_session_picks_best",
    "test_bench_overlapped_groups_path",
    "test_parity_soft_shadows_interpret",
    "test_pallas_interpret_sharded_matches_single",
    "test_fetch_taper_overlaps_odd_tile_counts",
    "test_streaming_render_matches_resident",
    "test_pool_never_drops_under_sustained_branching",
    "test_device_encode_matches_f32_path",
    "test_pallas_full_trace_matches_xla",
    "test_pallas_full_trace_matches_xla_backface",
    "test_renderer_mesh_mode_matches_single",
    "test_progressive_path_matches_fused",
    "test_pool_path_sharded_matches_single",
    "test_tile_major_layout_is_bit_identical_to_rowmajor",
    "test_heterogeneous_packets_couple_budgets",
    "test_packet_pool_matches_stack",
    "test_tiles_per_program_chunking_identical",
    "test_render_image_sharded_matches_single",
    "test_renderer_warns_on_drops",
    "test_renderer_quiet_at_default_capacity",
    "test_mesh_wall_pipeline_bit_identical",
    # r5 re-tier (VERDICT r4 item 8: smoke <3 min on this box): the
    # slowest smoke tests move to the nightly tier; each keeps a faster
    # smoke-tier sibling covering the same subsystem (sort-gate:
    # single-chunk + order-permutation tests stay; prime: covered by the
    # sort-gate single-chunk path + opq/lane exactness; compaction/dedupe/
    # packet/soft-shadow parity: the small interpret + realistic parity
    # gates stay)
    "test_sort_gate_is_exact_multichunk",
    "test_prime_gate_is_exact",
    "test_compaction_matches_full",
    "test_dedupe_aa_matches_full_expansion",
    "test_bench_json_contract_realistic",
    "test_homogeneous_packets_match_per_ray",
    "test_parity_soft_shadows",
    "test_auto_sized_pool_reports_zero_drops_through_u32_path",
    "test_occlude_stream_mixed_trans_blocks",
    "test_undersized_pool_reports_drops_through_u32_path",
    # k=1 ordering edge of the packed-rows epilogue; the pool-path
    # bit-identity gate stays in smoke
    "test_packed_rows_bit_identical_single_child",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for it in items:
        if it.name.split("[")[0] in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)
