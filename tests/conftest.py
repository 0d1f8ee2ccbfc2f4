"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

Multi-chip sharding paths are tested on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); numerical parity tests use
float64 for tight tolerances (TPU runs use f32 — covered by looser-tolerance
assertions where relevant).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: op-by-op dispatch is extremely slow in sandboxed
# environments, so tests jit everything and reuse compiled artifacts across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pathlib

import numpy as np
import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")

requires_reference = pytest.mark.skipif(
    not REFERENCE_DIR.exists(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def backbone_system():
    """Deca-alanine backbone Topology + FFParams (f64) + start coords."""
    import jax.numpy as jnp
    from molecular_dynamics_tpu.examples import (
        decaalanine_backbone,
        BACKBONE_FF_PRM,
    )
    from molecular_dynamics_tpu.ff import YamlForceField, build_ff_params

    top, coords = decaalanine_backbone()
    ff = build_ff_params(top, YamlForceField(BACKBONE_FF_PRM), dtype=jnp.float64)
    return top, ff, np.asarray(coords)


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared session generator makes fixture
    # data depend on test execution order (flaky under -p no:randomly too).
    return np.random.default_rng(1234)
