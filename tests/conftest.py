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
