#!/usr/bin/env python
"""System-size tier benchmark: fused campaign kernel vs composed XLA path.

Measures aggregate steps/sec on tiled deca-alanine composites
(``examples.tiled_decaalanine``) across kernel tiers — the scalability
surface the reference never exercises (its largest system is 104 atoms).
Produces the docs/VALIDATION.md system-size table rows.

Usage: python scripts/bench_tiers.py [m ...]   (default: 1 4 8)
Env: MDX_TIER_REPS=<reps at m=1> (scaled down by m), MDX_TIER_STEPS,
MDX_TIER_PATHS=comma list of fused-ring,fused-dense,composed,composed-xla.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mdx_jax_cache")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from molecular_dynamics_tpu import maxwell_boltzmann, system_init, total_energy
from molecular_dynamics_tpu.energy import REFERENCE_CONFIG
from molecular_dynamics_tpu.examples import tiled_decaalanine
from molecular_dynamics_tpu.integrate import initialize_forces
from molecular_dynamics_tpu.sim import SimulationConfig, make_ensemble_step_fn
from molecular_dynamics_tpu.system import replicate

STEPS = int(os.environ.get("MDX_TIER_STEPS", 500))
REPS1 = int(os.environ.get("MDX_TIER_REPS", 768))
PATHS = os.environ.get(
    "MDX_TIER_PATHS", "fused-ring,fused-dense,composed,composed-xla"
).split(",")


def measure(ffm, pos, n_reps, path):
    n = ffm.n_atoms
    key = jax.random.PRNGKey(0)
    state = system_init(
        pos, vel=maxwell_boltzmann(key, ffm.masses, 300.0), key=key
    )
    state = initialize_forces(
        state,
        lambda p, b: -jax.grad(
            lambda q: total_energy(q, ffm, config=REFERENCE_CONFIG)
        )(p),
    )
    ens = replicate(state, n_reps, seed=1)

    if path.startswith("fused"):
        from molecular_dynamics_tpu.ops.fused_step import (
            make_fused_campaign_op,
        )

        mode = path.split("-")[1]
        adv = make_fused_campaign_op(
            ffm, n_inner=50, dt_fs=1.0, temperature=300.0, gamma_ps=1.0,
            cutoff=REFERENCE_CONFIG.cutoff,
            switch_dist=REFERENCE_CONFIG.switch_dist,
            rfa=REFERENCE_CONFIG.rfa,
            pair_mode=mode,
            block_r=int(os.environ.get("MDX_TIER_BLOCK", 0)),
        )

        @jax.jit
        def advance(s, nsteps):
            def seg(i, st):
                p, v, f = adv(
                    st.pos, st.vel, st.forces, st.step[0],
                    jnp.int32(1234) + i + st.step[0],
                )
                return st.replace(pos=p, vel=v, forces=f, step=st.step + 50)

            return jax.lax.fori_loop(0, nsteps // 50, seg, s)

    else:
        cfg = SimulationConfig(
            dt_fs=1.0,
            fused_nonbonded=(path == "composed"),
            energy=REFERENCE_CONFIG,
        )
        step_fn = make_ensemble_step_fn(ffm, cfg)

        @jax.jit
        def advance(s, nsteps):
            return jax.lax.fori_loop(0, nsteps, lambda _, st: step_fn(st), s)

    ens = advance(ens, 50)
    jax.block_until_ready(ens.pos)
    t0 = time.perf_counter()
    ens = advance(ens, STEPS)
    jax.block_until_ready(ens.pos)
    dt_wall = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(ens.pos))), f"{path} diverged"
    return STEPS * n_reps / dt_wall


def main():
    ms = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    for m in ms:
        ffm, cm, _ = tiled_decaalanine(m)
        n_reps = max(8, REPS1 // m)
        pos = jnp.asarray(cm, jnp.float32)
        for path in PATHS:
            try:
                rate = measure(ffm, pos, n_reps, path)
                print(
                    f"m={m} atoms={ffm.n_atoms} reps={n_reps} {path}: "
                    f"{rate:,.0f} agg steps/s "
                    f"({rate * ffm.n_atoms / 1e6:,.1f}M atom-steps/s)",
                    flush=True,
                )
            except Exception as e:  # VMEM failures are data, not crashes
                print(
                    f"m={m} atoms={ffm.n_atoms} reps={n_reps} {path}: "
                    f"FAILED {type(e).__name__}: {str(e)[:200]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
