"""Dense graph-attention network simulator (GNS-style).

TPU-native re-design of the reference's torch-geometric GAT stack
(Molecule_Dynamics_v1/Single_Graph_GAT_V8/single_graph_gat.py:147-174 and
the Hamiltonian GATModel, cuda_nn_models.py:155-223): encoder -> M residual
processor blocks -> decoder, attention over a kNN adjacency. At N <= a few
hundred atoms, sparse message passing is the wrong tool on TPU — attention
runs dense over an (N, N) mask on the MXU (SURVEY.md §2.12).

The simulator follows the GNS recipe: node features = position + velocity
history, targets = accelerations, semi-implicit Euler rollout with the kNN
graph rebuilt every step (single_graph_gat.py:225-260).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from molecular_dynamics_tpu.features import knn_graph_mask


class DenseGATLayer(nn.Module):
    """Single-head GAT attention layer over a dense boolean adjacency."""

    out_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        # h: (..., N, F); adj: (..., N, N) bool (True = edge j->i attended)
        w = nn.Dense(self.out_dim, use_bias=False)(h)
        a_src = nn.Dense(1, use_bias=False)(w)[..., 0]  # (..., N)
        a_dst = nn.Dense(1, use_bias=False)(w)[..., 0]
        logits = nn.leaky_relu(
            a_src[..., :, None] + a_dst[..., None, :], 0.2
        )
        logits = jnp.where(adj, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(adj, attn, 0.0)  # rows with no edges -> all zero
        return attn @ w


class GATSimulator(nn.Module):
    """Encoder / residual processors / decoder over dense kNN attention."""

    node_out: int = 3  # predicted acceleration
    latent: int = 128
    n_processors: int = 3
    k: int = 40

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """nodes: (N, F) features; pos: (N, 3) for the kNN graph."""
        adj = knn_graph_mask(pos, min(self.k, pos.shape[-2] - 1))
        h = nn.relu(nn.Dense(self.latent)(nodes))
        h = DenseGATLayer(self.latent)(h, adj)
        for _ in range(self.n_processors):
            h = h + nn.relu(DenseGATLayer(self.latent)(h, adj))  # residual
        h = nn.relu(nn.Dense(self.latent)(h))
        return nn.Dense(self.node_out)(h)


class LSTMGAT(nn.Module):
    """LSTM temporal encoder feeding a GAT spatial decoder — the hybrid
    family (Molecule_Dynamics_v2/LSTM_GAT_V2/lstm.py:64-125): a history
    window of per-atom features is encoded per atom by an LSTM, then the
    final hidden states are refined over the kNN graph by GAT layers."""

    out_dim: int = 3
    hidden_size: int = 64
    latent: int = 64
    n_processors: int = 2
    k: int = 10

    @nn.compact
    def __call__(self, history: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """history: (N, T, F) per-atom time series; pos: (N, 3)."""
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(
            history.astype(jnp.float32)
        )[..., -1, :]  # (N, H)
        adj = knn_graph_mask(pos, min(self.k, pos.shape[-2] - 1))
        h = nn.relu(nn.Dense(self.latent)(h))
        for _ in range(self.n_processors):
            h = h + nn.relu(DenseGATLayer(self.latent)(h, adj))
        return nn.Dense(self.out_dim)(h)


def gns_rollout(
    model: GATSimulator,
    params,
    pos0: jnp.ndarray,
    vel_history: jnp.ndarray,
    n_steps: int,
    dt: float = 1.0,
):
    """Autoregressive semi-implicit Euler rollout with a shifting velocity-
    history queue (single_graph_gat.py:225-260). Returns (n_steps, N, 3)."""

    def step(carry, _):
        pos, hist = carry  # hist: (H, N, 3) velocity history
        feats = jnp.concatenate(
            [pos] + [hist[i] for i in range(hist.shape[0])], axis=-1
        )
        acc = model.apply(params, feats, pos)
        vel = hist[-1] + acc * dt
        pos = pos + vel * dt
        hist = jnp.concatenate([hist[1:], vel[None]], axis=0)
        return (pos, hist), pos

    (_, _), traj = jax.lax.scan(
        step, (pos0, vel_history), None, length=n_steps
    )
    return traj
