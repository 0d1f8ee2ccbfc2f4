"""Sequence-model training: windowed LSTM / NLL / Seq2Seq / Transformer.

The reference's windowed prediction recipe (Molecule_Dynamics_v2/LSTM_V6):
composite position+phi+psi+kNN-distance loss on the next frame; the NLL
variants train the Gaussian head; Seq2Seq trains sequence L2 without teacher
forcing. One jitted step per family; the same step functions drive the
Transformer (any model with the (window) -> prediction signature).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax

from molecular_dynamics_tpu.train.losses import window_composite_loss
from molecular_dynamics_tpu.models.seq import gaussian_nll


@dataclasses.dataclass(frozen=True)
class SeqTrainConfig:
    lr: float = 1e-4
    clip_norm: float = 1.0
    n_atoms: int = 40
    w_pos: float = 1.0
    w_phi: float = 1.0
    w_psi: float = 1.0
    w_dist: float = 1.0
    knn_k: int = 5


def make_window_trainer(
    model,
    phi_idx,
    psi_idx,
    config: SeqTrainConfig = SeqTrainConfig(),
):
    """Composite-loss next-frame trainer (LSTM_V6/lstm.py:226)."""
    from molecular_dynamics_tpu.features import knn_mask

    opt = optax.chain(
        optax.clip_by_global_norm(config.clip_norm), optax.adam(config.lr)
    )
    knn = knn_mask(config.n_atoms, config.knn_k)
    phi_idx = jnp.asarray(phi_idx)
    psi_idx = jnp.asarray(psi_idx)

    @jax.jit
    def step(params, opt_state, window, target):
        def loss(p):
            pred = model.apply(p, window)
            return window_composite_loss(
                pred.reshape(-1, config.n_atoms, 3),
                target.reshape(-1, config.n_atoms, 3),
                phi_idx,
                psi_idx,
                knn,
                config.w_pos,
                config.w_phi,
                config.w_psi,
                config.w_dist,
            )

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def make_nll_trainer(model, lr: float = 1e-4, clip_norm: float = 1.0):
    """Gaussian-NLL next-frame trainer (LSTM_NLL_V1, TF1 'Alpha' line)."""
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, window, target):
        def loss(p):
            mu, sigma = model.apply(p, window)
            return gaussian_nll(mu, sigma, target)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def make_seq2seq_trainer(
    model, decode_len: int, lr: float = 1e-4, clip_norm: float = 1.0
):
    """Sequence L2 trainer, noise-fed decoder (Seq2Seq_V1/seq2seq.py)."""
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    @jax.jit
    def step(params, opt_state, key, window, target_seq):
        def loss(p):
            pred = model.apply(p, window, key, decode_len)
            return jnp.mean((pred - target_seq) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def autoregressive_rollout(model, params, window, n_steps: int,
                           corrector=None):
    """Rollout driver: repeatedly predict the next frame and shift the
    window (the reference's test.py pattern, LSTM_V6/test.py:1-40).
    ``corrector`` (make_frame_corrector) relaxes each predicted frame
    before it is emitted and fed back."""

    def body(w, _):
        pred = model.apply(params, w[None])[0]
        if corrector is not None:
            pred = corrector(pred)
        w = jnp.concatenate([w[1:], pred[None]], axis=0)
        return w, pred

    _, frames = jax.lax.scan(body, window, None, length=n_steps)
    return frames


def chained_decode_rollout(model, params, window, key, decode_len: int,
                           n_steps: int, corrector=None):
    """Seq2Seq generation by chaining trained-horizon decodes: decode
    ``decode_len`` frames from the history window, shift the window by the
    whole segment, repeat — the decoder only ever runs at the horizon it
    was trained (and, for the GAN variant, the horizon its critic scored).
    Returns (~n_steps, features)."""

    def body(carry, _):
        w, k = carry
        k, sub = jax.random.split(k)
        seg = model.apply(params, w[None], sub, decode_len)[0]
        if corrector is not None:
            seg = jax.vmap(corrector)(seg)
        w = jnp.concatenate([w[decode_len:], seg], axis=0)
        return (w, k), seg

    (_, _), segs = jax.lax.scan(
        body, (window, key), None, length=max(1, n_steps // decode_len)
    )
    return segs.reshape(-1, segs.shape[-1])


def nll_sampling_rollout(model, params, window, key, n_steps: int,
                         corrector=None):
    """Autoregressive generation from a Gaussian-NLL head: each step samples
    x ~ N(mu, sigma) from the predicted density and feeds it back — the
    predict-and-emit capability of the reference's NLL lines
    (Molecule_Dynamics_v1/Alpha/NLL_Train.py:40-356 + predsToPDB.py;
    LSTM_NLL_V1/LSTMNLL_Train.py:89-172). Returns (n_steps, features)."""

    def body(carry, _):
        w, key = carry
        key, sub = jax.random.split(key)
        mu, sigma = model.apply(params, w[None])
        pred = mu[0] + sigma[0] * jax.random.normal(
            sub, mu[0].shape, mu.dtype
        )
        if corrector is not None:
            pred = corrector(pred)
        w = jnp.concatenate([w[1:], pred[None]], axis=0)
        return (w, key), pred

    _, frames = jax.lax.scan(body, (window, key), None, length=n_steps)
    return frames


def make_seq2seq_gan_trainer(
    gen,
    disc,
    decode_len: int,
    lr_g: float = 1e-4,
    lr_d: float = 1e-4,
    adv_weight: float = 0.1,
    clip_norm: float = 1.0,
):
    """Adversarial Seq2Seq: the noise-fed decoder's rollouts are scored by
    an LSTM sequence critic (Seq2Seq_Position_GAN_V1/lstm.py:99-237).

    Generator loss = sequence L2 + ``adv_weight`` x non-saturating BCE
    against the critic; the critic separates real future windows from
    decoded ones. Returns (opt_g, opt_d, g_step, d_step).
    """
    opt_g = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr_g))
    opt_d = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr_d))

    @jax.jit
    def g_step(g_params, g_opt, d_params, key, window, target_seq):
        def loss(gp):
            pred = gen.apply(gp, window, key, decode_len)
            l2 = jnp.mean((pred - target_seq) ** 2)
            logits = disc.apply(d_params, pred)
            adv = jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    logits, jnp.ones_like(logits)
                )
            )
            return l2 + adv_weight * adv

        val, grads = jax.value_and_grad(loss)(g_params)
        updates, g_opt = opt_g.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, val

    @jax.jit
    def d_step(d_params, d_opt, g_params, key, window, target_seq):
        fake = jax.lax.stop_gradient(
            gen.apply(g_params, window, key, decode_len)
        )

        def loss(dp):
            lr_ = disc.apply(dp, target_seq)
            lf = disc.apply(dp, fake)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(lr_, jnp.ones_like(lr_))
            ) + jnp.mean(
                optax.sigmoid_binary_cross_entropy(lf, jnp.zeros_like(lf))
            )

        val, grads = jax.value_and_grad(loss)(d_params)
        updates, d_opt = opt_d.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, val

    return opt_g, opt_d, g_step, d_step


def make_graph_seq2seq_trainer(
    model, decode_len: int, lr: float = 1e-3, clip_norm: float = 1.0,
    w_angles: float = 0.1, w_e2e: float = 1.0,
):
    """Graph-conditioned Seq2Seq trainer (Seq2Seq_Graph_Position_V1/
    lstm.py:170-200): position MSE on every decoded frame, a weighted
    angle-channel term, and the end-to-end pair-distance MSE the reference
    *intends* — its own pairing indexes ``dist(a, a) = 0`` for every pair
    (lstm.py:171-189), so the corrected form pairs atom i with atom
    N-1-i. Windows/targets are per-atom: (B, N, T, F) / (B, N, L, F)."""
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))

    def e2e(pos):  # (..., N, 3) -> (..., N//2) mirrored pair distances
        half = pos.shape[-2] // 2
        return jnp.linalg.norm(
            pos[..., :half, :] - jnp.flip(pos, -2)[..., :half, :], axis=-1
        )

    @jax.jit
    def step(params, opt_state, key, windows, targets):
        def loss(p):
            keys = jax.random.split(key, windows.shape[0])
            pred = jax.vmap(
                lambda w, k: model.apply(p, w, k, decode_len)
            )(windows, keys)  # (B, N, L, F)
            pos_p = jnp.swapaxes(pred[..., :3], 1, 2)  # (B, L, N, 3)
            pos_t = jnp.swapaxes(targets[..., :3], 1, 2)
            val = jnp.mean((pos_p - pos_t) ** 2)
            val += w_angles * jnp.mean((pred[..., 3:] - targets[..., 3:]) ** 2)
            val += w_e2e * jnp.mean((e2e(pos_p) - e2e(pos_t)) ** 2)
            return val

        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    return opt, step


def graph_chained_decode_rollout(model, params, window, key,
                                 decode_len: int, n_steps: int,
                                 refeature=None):
    """Chained trained-horizon decodes for per-atom (N, T, F) windows —
    the graph family's generation mode (same schedule as
    ``chained_decode_rollout``). Returns (~n_steps, N, F).

    ``refeature`` (optional, jit-safe ``(N, L, F) -> (N, L, F)``) rebuilds
    the derived feature channels (phi/psi torsions) of each decoded
    segment from its own predicted geometry before feedback. Without it
    the model's *predicted* angle channels drift out of consistency with
    its predicted coordinates over the chained rollout, feeding the
    encoder windows it never saw in training."""

    def body(carry, _):
        w, k = carry
        k, sub = jax.random.split(k)
        seg = model.apply(params, w, sub, decode_len)  # (N, L, F)
        if refeature is not None:
            seg = refeature(seg)
        w = jnp.concatenate([w[:, decode_len:], seg], axis=1)
        return (w, k), jnp.swapaxes(seg, 0, 1)

    (_, _), segs = jax.lax.scan(
        body, (window, key), None, length=max(1, n_steps // decode_len)
    )
    return segs.reshape(-1, *segs.shape[-2:])


def make_frame_corrector(
    ff, w_mean, w_std, n_steps: int = 8,
    dt_start: float = 1e-3, dt_max: float = 5e-3, energy_config=None,
    pin_groups=None, pin_fk: float = 50.0,
):
    """Physics-corrector for generated frames: a few FIRE relaxation steps
    through the differentiable force field applied to each predicted frame
    of a rollout (VERDICT r3 #5). One-step-ahead models accumulate
    geometry error over 1000-step autoregressive rollouts (bond stretch,
    clashes) much faster at full representation than on the 40-atom
    backbone; relaxing each frame before it is fed back keeps the
    trajectory on the physical manifold. The reference's stack could not
    afford an FF pass per generated frame (it rebuilds the force field
    per evaluation — BASELINE.md "reference inefficiency"); here the
    correction is a jitted ``lax.fori_loop`` inside the generation scan.

    Operates on the rollout representation (whitened flat features):
    unwhitens to coordinates, relaxes, re-whitens. Returns a jit-safe
    ``(features,) -> (features,)`` function.

    ``pin_groups=(i, j)`` adds a harmonic restraint (``pin_fk``
    kcal/mol/A^2) holding the i<->j distance at the *incoming frame's own
    value* during the relaxation — restrained minimization along the SMD
    reaction coordinate. Measured motivation (full-rep lstm rollout):
    unrestrained FIRE trades the pulling pathway for compactness — e2e
    error worsens past ~16 steps (fire:16 3.50 A, fire:32 5.04 A) while
    Rg keeps improving (0.47 -> 0.08) because minimization collapses the
    end-to-end extension the data's bias held. Pinning the colvar relaxes
    the orthogonal degrees of freedom only, matching the data-generating
    (biased) ensemble.
    """
    from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy
    from molecular_dynamics_tpu.integrate import minimize_fire

    cfg = energy_config or REFERENCE_CONFIG
    n = ff.n_atoms
    mean = jnp.asarray(w_mean, jnp.float32)
    std = jnp.asarray(w_std, jnp.float32)

    if pin_groups is None:
        energy = lambda q, _d0: total_energy(q, ff, config=cfg)
    else:
        gi, gj = int(pin_groups[0]), int(pin_groups[1])

        def energy(q, d0):
            d = jnp.sqrt(jnp.sum((q[gj] - q[gi]) ** 2) + 1e-12)
            return (
                total_energy(q, ff, config=cfg)
                + 0.5 * pin_fk * (d - d0) ** 2
            )

    raw_force = lambda p, d0: -jax.grad(energy)(p, d0)

    def correct(flat):
        pos = (flat * std + mean).reshape(n, 3)
        if pin_groups is None:
            d0 = jnp.asarray(0.0, pos.dtype)
        else:
            d0 = jnp.sqrt(
                jnp.sum((pos[int(pin_groups[1])]
                         - pos[int(pin_groups[0])]) ** 2) + 1e-12
            )

        def force(p):
            # full-representation frames can carry r -> 0 clashes whose
            # LJ force overflows f32 to inf; FIRE's f/|f| mixing then
            # turns the whole frame NaN (measured: 104-atom lstm rollout
            # all-NaN). Saturate to a finite ceiling — the trust region
            # bounds the step anyway, only the direction matters on a
            # clash.
            f = jnp.nan_to_num(
                raw_force(p, d0), nan=0.0, posinf=1e4, neginf=-1e4
            )
            return jnp.clip(f, -1e4, 1e4)

        # trust region 0.05 A/component/step: generated frames can carry
        # clashes with |F| ~ 1e6 — unclamped FIRE throws atoms km away
        relaxed = minimize_fire(
            pos, force, n_steps=n_steps, dt_start=dt_start, dt_max=dt_max,
            max_disp=0.05,
        )
        # belt-and-braces: a diverged relaxation must not poison the
        # rollout — fall back to the uncorrected frame
        relaxed = jnp.where(jnp.isfinite(relaxed).all(), relaxed, pos)
        return (relaxed.reshape(-1) - mean) / std

    return correct


def make_langevin_corrector(
    ff, w_mean, w_std, n_steps: int = 10, dt_fs: float = 1.0,
    temperature: float = 300.0, gamma_ps: float = 20.0,
    energy_config=None, pin_groups=None, pin_fk: float = 50.0,
    max_disp: float = 0.05,
):
    """Thermostatted physics-corrector: a few BAOAB Langevin steps at the
    data temperature instead of FIRE minimization.

    Measured motivation (full-rep lstm rollout): FIRE relaxation drives
    each frame toward a 0 K minimum — helpful at shallow depth (fire:16
    e2e 4.85 -> 3.50 A) but deeper relaxation feeds the model inputs
    *colder* than anything in its (300 K) training distribution and the
    rollout drifts (fire:32 5.04, even with the colvar pinned 4.55). A
    short thermostatted burst fixes clashes while keeping the frame on
    the thermal manifold the model was trained on.

    Same contract as :func:`make_frame_corrector`: jit-safe
    ``(features,) -> (features,)`` on whitened flat features. Velocities
    are Maxwell-sampled at ``temperature`` from a key folded from the
    frame bits (the rollout APIs give the corrector no key; a
    content-derived fold keeps the map deterministic per frame).
    ``pin_groups``/``pin_fk`` add the same hold-the-colvar restraint as
    the FIRE corrector. Forces are finite-clamped and the per-step
    displacement is trust-regioned at ``max_disp`` A/component — clash
    frames carry |F| ~ 1e6 that would otherwise eject atoms.
    """
    from molecular_dynamics_tpu import units
    from molecular_dynamics_tpu.energy import REFERENCE_CONFIG, total_energy

    cfg = energy_config or REFERENCE_CONFIG
    n = ff.n_atoms
    mean = jnp.asarray(w_mean, jnp.float32)
    std = jnp.asarray(w_std, jnp.float32)
    m = jnp.asarray(ff.masses, jnp.float32)[:, None]
    dt = dt_fs / units.TIMEFACTOR
    gamma = gamma_ps * (units.TIMEFACTOR / 1000.0)
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt(units.BOLTZMANN * temperature / m * (1.0 - c1 * c1))
    v_sigma = jnp.sqrt(units.BOLTZMANN * temperature / m)

    if pin_groups is None:
        energy = lambda q, _d0: total_energy(q, ff, config=cfg)
    else:
        gi, gj = int(pin_groups[0]), int(pin_groups[1])

        def energy(q, d0):
            d = jnp.sqrt(jnp.sum((q[gj] - q[gi]) ** 2) + 1e-12)
            return (
                total_energy(q, ff, config=cfg)
                + 0.5 * pin_fk * (d - d0) ** 2
            )

    def force(p, d0):
        f = jnp.nan_to_num(
            -jax.grad(energy)(p, d0), nan=0.0, posinf=1e4, neginf=-1e4
        )
        return jnp.clip(f, -1e4, 1e4)

    def correct(flat):
        pos0 = (flat * std + mean).reshape(n, 3)
        if pin_groups is None:
            d0 = jnp.asarray(0.0, pos0.dtype)
        else:
            d0 = jnp.sqrt(
                jnp.sum((pos0[int(pin_groups[1])]
                         - pos0[int(pin_groups[0])]) ** 2) + 1e-12
            )
        seed = jax.lax.bitcast_convert_type(
            jnp.sum(flat, dtype=jnp.float32), jnp.int32
        )
        key = jax.random.fold_in(jax.random.PRNGKey(20260819), seed)
        kv, ko = jax.random.split(key)
        vel0 = v_sigma * jax.random.normal(kv, (n, 3), jnp.float32)

        def body(i, carry):
            pos, vel, f = carry
            kn = jax.random.fold_in(ko, i)
            v1 = vel + 0.5 * dt * f / m
            p1 = pos + 0.5 * dt * v1
            v1 = c1 * v1 + c2 * jax.random.normal(kn, (n, 3), jnp.float32)
            p2 = p1 + 0.5 * dt * v1
            # trust region on the whole step's displacement
            p2 = pos + jnp.clip(p2 - pos, -max_disp, max_disp)
            f2 = force(p2, d0)
            v2 = v1 + 0.5 * dt * f2 / m
            return p2, v2, f2

        out, _, _ = jax.lax.fori_loop(
            0, n_steps, body, (pos0, vel0, force(pos0, d0))
        )
        out = jnp.where(jnp.isfinite(out).all(), out, pos0)
        return (out.reshape(-1) - mean) / std

    return correct


def corrector_from_env(ff, w_mean, w_std, env="MDX_ROLLOUT_CORRECT"):
    """Build a frame corrector from the recipe env knob, or None.

    Format: ``<mode>:<n_steps>[:pin[<fk>]]`` with mode ``fire`` (FIRE
    relaxation, :func:`make_frame_corrector`) or ``langevin``
    (thermostatted burst, :func:`make_langevin_corrector`) — e.g.
    ``MDX_ROLLOUT_CORRECT=fire:8``, ``fire:16:pin``, ``langevin:10`` or
    ``langevin:10:pin100``. The optional ``pin`` field holds each
    frame's own end-to-end distance with a harmonic restraint of ``fk``
    kcal/mol/A^2 (default 50) between the first and last atoms — the SMD
    colvar of the decaalanine campaigns
    (``scripts/regenerate_smd.py:101``). Off by default — the corrector
    is a full-representation rescue lever; committed backbone-family
    artifacts stay reproducible without it.
    """
    import os

    spec = os.environ.get(env, "")
    if not spec:
        return None
    return corrector_from_spec(ff, w_mean, w_std, spec, what=env)


def corrector_from_spec(ff, w_mean, w_std, spec: str, what: str = "spec"):
    """Build a frame corrector from a ``<mode>:<n>[:pin[<fk>]]`` string.

    The parsing core of :func:`corrector_from_env`, exposed so sweep
    tooling (scripts/sweep_fullrep_corrector.py) can score many specs
    against one checkpoint without mutating the environment. ``"none"``
    or an empty spec returns None (the uncorrected rollout).
    """
    if not spec or spec == "none":
        return None
    parts = spec.split(":")
    makers = {
        "fire": make_frame_corrector,
        "langevin": make_langevin_corrector,
    }
    if parts[0] not in makers:
        raise ValueError(
            f"{what} mode must be 'fire' or 'langevin', got {parts[0]!r}"
        )
    kwargs = {}
    if len(parts) > 2:
        if not parts[2].startswith("pin"):
            raise ValueError(f"{what} third field must be 'pin[<fk>]'")
        kwargs["pin_groups"] = (0, ff.n_atoms - 1)
        if parts[2][3:]:
            kwargs["pin_fk"] = float(parts[2][3:])
    return makers[parts[0]](
        ff, w_mean, w_std, n_steps=int(parts[1] or 8), **kwargs
    )
