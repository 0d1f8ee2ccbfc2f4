"""Ring-shift pair-terms kernel: each unordered pair computed exactly once.

The dense kernel (``ops.nonbonded``) evaluates the full symmetric (N, N)
matrix — every pair twice. This variant pairs atom ``i`` with atom
``(i + k) mod L`` for shifts k = 1..L/2 (L = lane-padded atom count): a
classic round-robin covering where every unordered pair appears exactly once
(the k = L/2 shift covers each twice and is pre-scaled by 0.5 in its table
row). Per shift the work is a lane-wide (BR, L) vector op with the partner
coordinates produced by an incremental one-lane ``pltpu.roll`` — so the
pair-term element count halves versus the dense kernel, at the cost of 6
lane-rotations per shift.

Partner-force accumulation uses the rolled-accumulator identity: iterating
shifts k = L/2..1 with ``A <- roll(A, 1) + c_k`` and one final roll gives
``A = sum_k roll(c_k, k)`` without ever materialising per-shift rolls of
arbitrary distance.

Same physics and tables as the dense kernel (LJ+switch, RFA Coulomb, bonds/
UB, pre-scaled 1-4), same custom_vjp fallback; parity-tested against both.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from molecular_dynamics_tpu import units
from molecular_dynamics_tpu.ff.params import FFParams
from molecular_dynamics_tpu.ops.nonbonded import LANE, _build_pair_tables


def ring_pair_forces(
    x, y, z,  # (BR, L) coordinate values
    tables,  # 9 arrays, each (NSHIFT, L)
    *, n_shifts: int, cutoff2: float, krf: float, crf: float,
    switch_dist: float, inv_switch_span: float, gb=None,
    start_roll=None, final_roll=None,
):
    """Shared ring-shift pair loop over VALUES (used by the standalone pair
    kernel and the fully-fused step kernel). Returns (fx, fy, fz, e_slots).

    ``gb`` (fused GB-OBC path only) fuses the Still pair force into this
    loop — the Born radii are already known when it runs, so the GB pair
    term rides the same per-shift geometry instead of a second full sweep:
    a dict with ``born`` (BR, L) Born radii, ``born_inv`` (BR, L) their
    reciprocals (free from the OBC pass, which forms R = 1/(rho_inv -
    tanh·radi) — carrying both turns the three VPU divisions of the Still
    term into multiplies), ``qq_t``/``gm_t`` (NSHIFT, L)
    ELEC-scaled charge products and the pair mask (both 0.5-scaled on the
    halfway row), and ``uprime(f, finv)`` = d/df of the Still prefactor.
    With gb the return gains ``der`` = per-atom dE/dR_born sums (excluding
    the Born self terms, which have no pair geometry).

    ``start_roll``/``final_roll`` (traced i32) generalize the loop to a
    CHUNK of the shift range: with tables holding rows for shifts
    k = k_lo..k_hi (k_hi at row n_shifts-1, descending), pass
    ``start_roll = lanes - k_hi`` and ``final_roll = k_lo``. The rolled
    accumulator then telescopes to sum_k roll(c_k, k) exactly as in the
    full loop (A after the chunk = sum roll(c_k, k - k_lo); one final
    dynamic roll by k_lo restores the absolute offsets). This is what the
    grid-chunked large-system kernel uses — the full static unroll over
    n_pad/2 shifts is the compile-time wall past ~4 lane-tiles of atoms.
    """
    qq_t, a_t, b_t, m_t, kb_t, d0_t, a14_t, b14_t, qq14_t = tables
    lanes = x.shape[1]
    start = (
        jnp.int32(lanes - n_shifts) if start_roll is None
        else jnp.asarray(start_roll, jnp.int32)
    )
    last = (
        jnp.int32(1) if final_roll is None
        else jnp.asarray(final_roll, jnp.int32)
    )
    one = jnp.int32(1)
    xs = pltpu.roll(x, start, 1)
    ys = pltpu.roll(y, start, 1)
    zs = pltpu.roll(z, start, 1)

    fx = jnp.zeros_like(x)
    fy = jnp.zeros_like(y)
    fz = jnp.zeros_like(z)
    ax = jnp.zeros_like(x)  # rolled partner-force accumulators
    ay = jnp.zeros_like(y)
    az = jnp.zeros_like(z)
    e = jnp.zeros_like(x)
    if gb is not None:
        born = gb["born"]
        born_inv = gb.get("born_inv")
        if born_inv is None:
            born_inv = 1.0 / born
        uprime = gb["uprime"]
        gqq_t = gb["qq_t"]
        bs = pltpu.roll(born, start, 1)
        bs_inv = pltpu.roll(born_inv, start, 1)
        der = jnp.zeros_like(x)
        rev = jnp.zeros_like(x)

    for k in range(n_shifts, 0, -1):  # static unroll, descending
        row = k - 1
        qq = qq_t[row, :][None]
        aa = a_t[row, :][None]
        bb = b_t[row, :][None]
        msym = m_t[row, :][None]
        kb = kb_t[row, :][None]
        d0 = d0_t[row, :][None]
        a14 = a14_t[row, :][None]
        b14 = b14_t[row, :][None]
        qq14 = qq14_t[row, :][None]

        dx = x - xs
        dy = y - ys
        dz = z - zs
        d2 = dx * dx + dy * dy + dz * dz

        mb = kb > 0.0
        m = jnp.where(d2 <= cutoff2, msym, 0.0)
        live = (m > 0.0) | mb | (qq14 != 0.0) | (a14 != 0.0)
        if gb is not None:
            gqq = gqq_t[row, :][None]
            live = live | (gqq != 0.0)
        safe = jnp.where(live, d2, 1.0)
        rinv = jax.lax.rsqrt(safe)
        rinv2 = rinv * rinv
        d = d2 * rinv

        pot_e = qq * (rinv + krf * d2 - crf)
        coeff_e = qq * (2.0 * krf - rinv2 * rinv)

        rinv6 = rinv2 * rinv2 * rinv2
        a12 = aa * rinv6 * rinv6
        b6 = bb * rinv6
        pot_l = a12 - b6
        dudr = (6.0 * b6 - 12.0 * a12) * rinv
        t = (d - switch_dist) * inv_switch_span
        sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
        dsw = t * t * (-30.0 + t * (60.0 - t * 30.0)) * inv_switch_span
        on = d > switch_dist
        coeff_l = jnp.where(on, (dudr * sw + pot_l * dsw) * rinv, dudr * rinv)
        pot_l = jnp.where(on, pot_l * sw, pot_l)

        pot = m * (pot_e + pot_l)
        coeff = m * (coeff_e + coeff_l)

        delta = d - d0
        pot = pot + jnp.where(mb, kb * delta * delta, 0.0)
        coeff = coeff + jnp.where(mb, 2.0 * kb * delta * rinv, 0.0)

        a14_12 = a14 * rinv6 * rinv6
        b14_6 = b14 * rinv6
        pot = pot + a14_12 - b14_6 + qq14 * rinv
        coeff = coeff + (6.0 * b14_6 - 12.0 * a14_12) * rinv2 - qq14 * rinv2 * rinv

        if gb is not None:
            # Still pair force on the same geometry (gqq = ELEC q_i q_j,
            # zero for ghosts, halved on the halfway row — so every GB
            # contribution is masked/scaled through it)
            qs = 0.25 * safe
            bb_g = born * bs
            exg = jnp.exp(-qs * (born_inv * bs_inv))
            f2 = safe + bb_g * exg
            finv = jax.lax.rsqrt(f2)
            fdist = f2 * finv
            nqu = -gqq * uprime(fdist, finv)
            coeff = coeff + nqu * (d * (1.0 - 0.25 * exg) * finv) * rinv
            half_ex_finv = 0.5 * exg * finv
            der = der + nqu * (bs + qs * born_inv) * half_ex_finv
            rev = pltpu.roll(rev, one, 1) + nqu * (
                born + qs * bs_inv
            ) * half_ex_finv

        cx = coeff * dx
        cy = coeff * dy
        cz = coeff * dz
        # F_i -= c ; F_{(i+k)%L} += c (via rolled accumulator)
        fx = fx - cx
        fy = fy - cy
        fz = fz - cz
        ax = pltpu.roll(ax, one, 1) + cx
        ay = pltpu.roll(ay, one, 1) + cy
        az = pltpu.roll(az, one, 1) + cz
        e = e + pot

        if k > 1:  # step partner window back by one lane
            xs = pltpu.roll(xs, one, 1)
            ys = pltpu.roll(ys, one, 1)
            zs = pltpu.roll(zs, one, 1)
            if gb is not None:
                bs = pltpu.roll(bs, one, 1)
                bs_inv = pltpu.roll(bs_inv, one, 1)

    fx = fx + pltpu.roll(ax, last, 1)
    fy = fy + pltpu.roll(ay, last, 1)
    fz = fz + pltpu.roll(az, last, 1)
    if gb is not None:
        der = der + pltpu.roll(rev, last, 1)
        return fx, fy, fz, e, der
    return fx, fy, fz, e


def _ring_kernel(
    x_ref, y_ref, z_ref,  # (BR, L)
    qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref, a14_ref, b14_ref, qq14_ref,
    # each (NSHIFT, L): row k-1 = dense_table[i, (i+k) % L]
    fx_ref, fy_ref, fz_ref, e_ref,  # (BR, L)
    *, n_shifts: int, cutoff2: float, krf: float, crf: float,
    switch_dist: float, inv_switch_span: float,
):
    tables = tuple(
        r[:]
        for r in (qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref, a14_ref,
                  b14_ref, qq14_ref)
    )
    fx, fy, fz, e = ring_pair_forces(
        x_ref[:], y_ref[:], z_ref[:], tables,
        n_shifts=n_shifts, cutoff2=cutoff2, krf=krf, crf=crf,
        switch_dist=switch_dist, inv_switch_span=inv_switch_span,
    )
    fx_ref[:] = fx
    fy_ref[:] = fy
    fz_ref[:] = fz
    e_ref[:] = e


def _ring_chunk_kernel(
    x_ref, y_ref, z_ref,  # (BR, L)
    qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref, a14_ref, b14_ref, qq14_ref,
    # each (SHIFT_CHUNK, L): the grid's chunk j holds global shift rows
    # [j*SHIFT_CHUNK, (j+1)*SHIFT_CHUNK) — shifts k = j*C+1 .. (j+1)*C
    fx_ref, fy_ref, fz_ref, e_ref,  # (BR, L), accumulated over chunks
    *, lanes: int, shift_chunk: int, cutoff2: float, krf: float, crf: float,
    switch_dist: float, inv_switch_span: float,
):
    """Grid-chunked ring pass: one fixed-size (static-unroll) shift chunk
    per grid cell, partial forces accumulated into the output block.

    The monolithic ring kernel statically unrolls all n_pad/2 shifts —
    past ~4 lane-tiles of atoms (n_pad >= 512) Mosaic's scheduler never
    finishes (docs/VALIDATION.md system-size table). Making the shift
    range a grid dimension keeps the compiled body at a constant 64
    shifts regardless of system size; the rolled-accumulator identity
    survives chunking via one dynamic roll per chunk (ring_pair_forces
    start_roll/final_roll).
    """
    j = pl.program_id(1)
    k_hi = (j + 1) * shift_chunk
    k_lo = j * shift_chunk + 1
    tables = tuple(
        r[:]
        for r in (qq_ref, a_ref, b_ref, m_ref, kb_ref, d0_ref, a14_ref,
                  b14_ref, qq14_ref)
    )
    fx, fy, fz, e = ring_pair_forces(
        x_ref[:], y_ref[:], z_ref[:], tables,
        n_shifts=shift_chunk, cutoff2=cutoff2, krf=krf, crf=crf,
        switch_dist=switch_dist, inv_switch_span=inv_switch_span,
        start_roll=lanes - k_hi, final_roll=k_lo,
    )

    @pl.when(j == 0)
    def _init():
        fx_ref[:] = fx
        fy_ref[:] = fy
        fz_ref[:] = fz
        e_ref[:] = e

    @pl.when(j > 0)
    def _accum():
        fx_ref[:] += fx
        fy_ref[:] += fy
        fz_ref[:] += fz
        e_ref[:] += e


def build_ring_tables(
    ff: FFParams,
    n_pad: int,
    include_ub=None,  # None -> auto: on iff ff carries UB springs
    include_bonds: bool = True,
    include_14: bool = True,
):
    """Per-shift ring tables: row k-1, lane i = dense_table[i, (i+k) % L].

    The half-way shift (k = L/2) covers each pair twice, so each term's
    contribution must be halved on that row — applied exactly ONCE per
    term: the cutoff mask (3) halves the elec+LJ branch (the kernel
    multiplies ``m * (pot_e + pot_l)``, so halving qq/A/B too would
    quarter them), and the unmasked branches halve their own scale tables
    (bond k, 1-4 A/B/qq). Geometric tables (qq(0)/A(1)/B(2) already
    covered via the mask, bond d0(5)) stay whole. Shared by the standalone
    ring kernel and the fully-fused campaign kernel so the physics lives
    once.
    """
    dense = [np.asarray(t) for t in _build_pair_tables(ff, include_ub, n_pad)]
    if not include_bonds:
        dense[4] = np.zeros_like(dense[4])
        dense[5] = np.zeros_like(dense[5])
    if not include_14:
        for idx in (6, 7, 8):
            dense[idx] = np.zeros_like(dense[idx])
    n_shifts = n_pad // 2
    i_idx = np.arange(n_pad)
    halve = {3, 4, 6, 7, 8}  # mask, bond k, 1-4 A/B/qq
    out = []
    for t_i, t in enumerate(dense):
        rows = np.zeros((n_shifts, n_pad), np.float32)
        for k in range(1, n_shifts + 1):
            rows[k - 1] = t[i_idx, (i_idx + k) % n_pad]
        if t_i in halve:
            rows[n_shifts - 1] *= 0.5
        out.append(jnp.asarray(rows))
    return tuple(out)


def make_pair_ring_op(
    ff: FFParams,
    cutoff: float = 9.0,
    switch_dist: float = 7.5,
    rfa: bool = True,
    solvent_dielectric: float = units.SOLVENT_DIELECTRIC,
    include_bonds: bool = True,
    include_14: bool = True,
    include_ub=None,  # None -> auto: on iff ff carries UB springs
    block_r: int = 64,
    shift_chunk: int = 0,  # 0 -> auto: 64 when n_shifts > 64, else mono
    interpret: bool = False,
):
    """Ring-shift variant of ``make_nonbonded_op`` (same contract).

    Above one lane-tile of atoms the shift loop runs grid-chunked
    (``shift_chunk`` shifts per grid cell, default 64 — the proven
    104-atom body size) so compile time stays constant in system size;
    at n_pad = 128 the original monolithic kernel is used unchanged.
    """
    n = ff.n_atoms
    n_pad = ((n + LANE - 1) // LANE) * LANE
    n_shifts = n_pad // 2
    if not shift_chunk:
        # MDX_RING_CHUNK probes smaller static bodies on systems where
        # Mosaic rejects the default chunk (64 — proven through 416
        # atoms / 4 lane tiles)
        shift_chunk = min(
            n_shifts, int(os.environ.get("MDX_RING_CHUNK", "64"))
        )
    n_chunks = (n_shifts + shift_chunk - 1) // shift_chunk
    if n_shifts % shift_chunk:
        raise ValueError(
            f"shift_chunk={shift_chunk} must divide n_shifts={n_shifts} "
            f"(n_pad={n_pad})"
        )
    if rfa:
        denom = 2.0 * solvent_dielectric + 1.0
        krf = (solvent_dielectric - 1.0) / (denom * cutoff**3)
        crf = 3.0 * solvent_dielectric / (denom * cutoff)
    else:
        krf, crf = 0.0, 0.0

    ring_tables = build_ring_tables(
        ff, n_pad, include_ub=include_ub,
        include_bonds=include_bonds, include_14=include_14,
    )

    _phys = dict(
        cutoff2=float(cutoff) ** 2 if cutoff is not None else 1e30,
        krf=float(krf),
        crf=float(crf),
        switch_dist=float(switch_dist if switch_dist is not None else 1e15),
        inv_switch_span=float(
            1.0 / (cutoff - switch_dist)
            if (switch_dist is not None and cutoff is not None)
            else 0.0
        ),
    )
    if n_chunks == 1:
        kern = functools.partial(_ring_kernel, n_shifts=n_shifts, **_phys)
    else:
        kern = functools.partial(
            _ring_chunk_kernel,
            lanes=n_pad, shift_chunk=shift_chunk, **_phys,
        )

    def _run(pos):
        r0 = pos.shape[0]
        r = ((r0 + block_r - 1) // block_r) * block_r
        if r != r0:
            pos = jnp.concatenate(
                [pos, jnp.broadcast_to(pos[:1], (r - r0,) + pos.shape[1:])]
            )
        coords = jnp.zeros((3, r, n_pad), jnp.float32)
        coords = coords.at[:, :, :n].set(
            jnp.moveaxis(pos.astype(jnp.float32), -1, 0)
        )
        out_shape = jax.ShapeDtypeStruct((r, n_pad), jnp.float32)
        if n_chunks == 1:
            row_spec = pl.BlockSpec(
                (block_r, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            tab_spec = pl.BlockSpec(
                (n_shifts, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            grid = (r // block_r,)
        else:
            # chunk grid innermost: each replica block's output is
            # revisited across shift chunks and accumulated in VMEM
            row_spec = pl.BlockSpec(
                (block_r, n_pad), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            )
            tab_spec = pl.BlockSpec(
                (shift_chunk, n_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            )
            grid = (r // block_r, n_chunks)
        fx, fy, fz, e = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[row_spec] * 3 + [tab_spec] * 9,
            out_specs=[row_spec] * 4,
            out_shape=[out_shape] * 4,
            interpret=interpret,
        )(coords[0], coords[1], coords[2], *ring_tables)
        forces = jnp.stack(
            [fx[:r0, :n], fy[:r0, :n], fz[:r0, :n]], axis=-1
        )
        return jnp.sum(e[:r0, :n_pad], axis=1), forces.astype(pos.dtype)

    # reuse the dense op's XLA reference for custom_vjp + parity
    from molecular_dynamics_tpu.ops.nonbonded import make_nonbonded_op

    dense_op = make_nonbonded_op(
        ff, cutoff=cutoff, switch_dist=switch_dist, rfa=rfa,
        solvent_dielectric=solvent_dielectric, include_bonds=include_bonds,
        include_14=include_14, include_ub=include_ub,
    )

    @jax.custom_vjp
    def pair_terms(pos):
        return _run(pos)

    def fwd(pos):
        return _run(pos), pos

    def bwd(pos, cot):
        g_e, g_f = cot
        _, vjp_e = jax.vjp(dense_op.reference_energy, pos)
        (g1,) = vjp_e(g_e)
        _, vjp_f = jax.vjp(dense_op.reference_forces, pos)
        (g2,) = vjp_f(g_f)
        return (g1 + g2,)

    pair_terms.defvjp(fwd, bwd)
    pair_terms.reference_energy = dense_op.reference_energy
    pair_terms.reference_forces = dense_op.reference_forces
    return pair_terms
