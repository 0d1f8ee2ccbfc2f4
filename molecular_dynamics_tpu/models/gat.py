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


class GraphSeq2Seq(nn.Module):
    """LSTM encoder -> noise-fed LSTM decoder -> dense-GAT refinement of
    every decoded frame over a kNN graph rebuilt from the frame's own
    predicted positions.

    The graph-conditioned Seq2Seq family (Molecule_Dynamics_v1/
    Seq2Seq_Graph_Position_V1/lstm.py:76-168): per-atom feature sequences
    [xyz, phi, psi] ride the LSTM batch dim; each decode step injects
    noise, advances the decoder LSTM from the encoder's carry, then
    conditions the frame on its own predicted geometry with graph
    attention (torch-geometric KNNGraph(6) + GATConv re-designed as dense
    MXU attention over ``knn_graph_mask``). The graph pass is residual so
    position information survives the refinement — the reference replaces
    the frame with a GATConv of its 2 angle features alone, which discards
    the decoded positions each step.
    """

    feat_dim: int = 5
    hidden_size: int = 64
    k: int = 6
    noise_scale: float = 0.5

    @nn.compact
    def __call__(self, window: jnp.ndarray, key, decode_len: int):
        """window: (N, T, feat_dim) per-atom history ->
        (N, decode_len, feat_dim) decoded frames."""
        x = window.astype(jnp.float32)
        n = x.shape[0]
        enc_cell = nn.OptimizedLSTMCell(self.hidden_size)
        dec_cell = nn.OptimizedLSTMCell(self.hidden_size)
        enc_head = nn.Dense(self.feat_dim)
        dec_head = nn.Dense(self.feat_dim)
        gat = DenseGATLayer(self.feat_dim)

        carry = enc_cell.initialize_carry(
            jax.random.PRNGKey(0), (n, x.shape[-1])
        )
        h = jnp.zeros((n, self.hidden_size), jnp.float32)
        for t in range(x.shape[1]):
            carry, h = enc_cell(carry, x[:, t, :])
        out = enc_head(h)
        noise = jax.random.normal(
            key, (decode_len, n, self.feat_dim), jnp.float32
        )
        outs = []
        for i in range(decode_len):
            carry, h = dec_cell(carry, out + self.noise_scale * noise[i])
            out = dec_head(h)
            adj = knn_graph_mask(out[..., :3], min(self.k, n - 1))
            out = out + gat(out, adj)
            outs.append(out)
        return jnp.stack(outs, axis=1)
