"""Dense SchNet: continuous-filter convolutions over atom distances.

Re-design of the reference's hand-rolled SchNet
(Hamiltonian/Mol-HNN-cuda-v4.2/cuda_nn_models.py:90-149): a ``Cfconv`` block
weights neighbour features by a filter network of the pairwise distances
(the reference uses exp(-||ri - rj||)), followed by interaction blocks with
shifted-softplus activations. At reference scale (N <= a few hundred) the
convolution is a dense (N, N) matmul — MXU work, no sparse ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from molecular_dynamics_tpu.features import distance_matrix


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(x) - jnp.log(2.0)


class CfConv(nn.Module):
    """Continuous-filter convolution: h_i' = sum_j W(d_ij) * h_j.

    ``rbf = 0`` feeds the filter network the reference's raw distance
    kernel exp(-d) (cuda_nn_models.py:95). That kernel saturates to 0 a
    few Angstrom out, so the filter — and every gradient through it —
    is blind to long-range geometry (the SMD pulling coordinate spans
    13-33 A); measured on the HNN rollout: 9.06 A e2e error. ``rbf > 0``
    expands d_ij on that many Gaussian radial bases spanning
    [0, rbf_cut] (the canonical SchNet featurization), keeping filter
    sensitivity at all ranges; same dense (N, N, K) -> MXU contraction.
    """

    features: int
    filter_hidden: int = 64
    rbf: int = 0
    rbf_cut: float = 24.0

    @nn.compact
    def __call__(self, h: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
        if self.rbf:
            mu = jnp.linspace(0.0, self.rbf_cut, self.rbf)
            gamma = (self.rbf - 1) / self.rbf_cut  # ~1/spacing
            w = jnp.exp(-gamma * (dist[..., None] - mu) ** 2)  # (N, N, K)
        else:
            w = jnp.exp(-dist)[..., None]  # (N, N, 1)
        w = shifted_softplus(nn.Dense(self.filter_hidden)(w))
        w = shifted_softplus(nn.Dense(self.features)(w))  # (N, N, F)
        return jnp.einsum("ijf,jf->if", w, h)


class SchNet(nn.Module):
    """Embedding -> 3 interaction blocks -> atomwise readout."""

    features: int = 64
    n_interactions: int = 3
    out_dim: int = 1
    readout: str = "sum"  # "sum" | "atoms"

    @nn.compact
    def __call__(self, pos: jnp.ndarray, atom_types: jnp.ndarray) -> jnp.ndarray:
        dist = distance_matrix(pos)
        h = nn.Embed(64, self.features)(atom_types)
        for _ in range(self.n_interactions):
            v = nn.Dense(self.features)(h)
            v = CfConv(self.features)(v, dist)
            v = nn.Dense(self.features)(shifted_softplus(v))
            h = h + v  # residual interaction
        out = nn.Dense(self.out_dim)(
            shifted_softplus(nn.Dense(self.features // 2)(h))
        )
        if self.readout == "sum":
            return jnp.sum(out, axis=-2)
        return out


class SchNetHNN(nn.Module):
    """SchNet-backbone scalar-field pair for the Mol-HNN line.

    The reference swaps the MLP Hamiltonian for a hand-rolled SchNet whose
    per-atom 2-channel readout sums over atoms to the (F1, F2) fields
    (Hamiltonian/Mol-HNN-cuda-v4.2/cuda_nn_models.py:90-149: a Conv1d
    embedding of the velocity channels, 3 interaction blocks whose
    continuous filters read exp(-d_ij) of the position half, atomwise
    head summed over atoms). Drop-in for ``models.hnn.HNN`` — same
    ``x (2*3N,) -> (2,)`` contract and ``field_type`` attribute, so
    ``time_derivative``/``rollout`` and the whole HNN trainer reuse.
    """

    n_atoms: int
    features: int = 64
    n_interactions: int = 3
    rbf: int = 0  # Gaussian distance bases (0 = reference exp(-d) kernel)
    field_type: str = "solenoidal"  # models.hnn.time_derivative contract

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.n_atoms
        pos = x[: 3 * n].reshape(n, 3)
        vel = x[3 * n :].reshape(n, 3)
        dist = distance_matrix(pos)
        h = nn.Dense(self.features)(vel)  # velocity-channel embedding
        for _ in range(self.n_interactions):
            v = nn.Dense(self.features)(h)
            v = CfConv(self.features, rbf=self.rbf)(v, dist)
            v = nn.Dense(self.features)(shifted_softplus(v))
            h = h + v
        out = nn.Dense(2)(shifted_softplus(nn.Dense(self.features // 2)(h)))
        return jnp.sum(out, axis=-2)  # (2,) == (F1, F2)
