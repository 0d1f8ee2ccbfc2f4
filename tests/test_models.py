"""Model zoo: forward shapes, basic semantics, one gradient step each."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molecular_dynamics_tpu.models import (
    MLP,
    Generator,
    Discriminator,
    HNN,
    ConditionalVAE,
    RealNVP,
    LSTMPredictor,
    LSTMNLLPredictor,
    Seq2Seq,
    GATSimulator,
    TrajectoryTransformer,
)
from molecular_dynamics_tpu.models import hnn as hnn_mod
from molecular_dynamics_tpu.models.vae import vae_loss
from molecular_dynamics_tpu.models.seq import gaussian_nll

KEY = jax.random.PRNGKey(0)


class TestCGAN:
    def test_generator_shapes(self):
        gen = Generator(n_atoms=40, latent_dim=31, hidden=(32, 32))
        z = jnp.zeros((6, 31))
        t = jnp.linspace(0, 1, 6)
        params = gen.init(KEY, z, t)
        flat = jax.jit(lambda p, z, t: gen.apply(p, z, t))(params, z, t)
        assert flat.shape == (6, 120)
        coords = gen.apply(params, z, t, method=Generator.coords)
        assert coords.shape == (6, 40, 3)

    def test_generator_scalar_time(self):
        gen = Generator(n_atoms=10, hidden=(16,))
        z = jnp.zeros((4, 31))
        params = gen.init(KEY, z, 0.5)
        out = gen.apply(params, z, 0.5)
        assert out.shape == (4, 30)

    def test_discriminator(self):
        disc = Discriminator(hidden=(16, 16))
        feats = jnp.zeros((6, 120))
        t = jnp.zeros((6,))
        params = disc.init(KEY, feats, t)
        logits = disc.apply(params, feats, t)
        assert logits.shape == (6,)


class TestHNN:
    def test_time_derivative_symplectic(self):
        model = HNN(hidden=(32, 32), field_type="solenoidal")
        x = jax.random.normal(KEY, (5, 8))
        params = model.init(KEY, x[0])
        dx = hnn_mod.time_derivative(model, params, x)
        assert dx.shape == (5, 8)
        # solenoidal field is divergence-free: check numerically at a point
        def field(xi):
            return hnn_mod.time_derivative(model, params, xi[None])[0]

        jac = jax.jacfwd(field)(x[0])
        div = jnp.trace(jac)
        assert abs(float(div)) < 1e-4

    def test_rollout(self):
        model = HNN(hidden=(16,))
        x0 = jax.random.normal(KEY, (6,))
        params = model.init(KEY, x0)
        traj = hnn_mod.rollout(model, params, x0, n_steps=20, dt=0.01)
        assert traj.shape == (20, 6)
        assert bool(jnp.all(jnp.isfinite(traj)))


class TestVAE:
    def test_forward_and_loss(self):
        m = ConditionalVAE(out_dim=120, latent_dim=8, enc_hidden=(32,), dec_hidden=(32,))
        x = jax.random.normal(KEY, (4, 120))
        b = jnp.array([0, 3, 5, 9])
        params = m.init(KEY, x, b, jax.random.PRNGKey(1))
        recon, mu, logvar = m.apply(params, x, b, jax.random.PRNGKey(2))
        assert recon.shape == x.shape
        loss = vae_loss(recon, x, mu, logvar)
        assert jnp.isfinite(loss)

    def test_decode_only(self):
        m = ConditionalVAE(out_dim=30, latent_dim=4, enc_hidden=(16,), dec_hidden=(16,))
        x = jnp.zeros((2, 30))
        b = jnp.array([1, 2])
        params = m.init(KEY, x, b, KEY)
        out = m.apply(params, jnp.zeros((2, 4)), b, method=ConditionalVAE.decode)
        assert out.shape == (2, 30)


class TestRealNVP:
    def test_invertibility_and_logprob(self):
        flow = RealNVP(dim=12, n_coupling=4, hidden=(32,))
        x = jax.random.normal(KEY, (7, 12))
        cond = jnp.linspace(0, 1, 7)[:, None]
        params = flow.init(KEY, x, cond)
        z, log_det = flow.apply(params, x, cond, method=RealNVP.forward)
        x_back = flow.apply(params, z, cond, method=RealNVP.inverse)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
        lp = flow.apply(params, x, cond)
        assert lp.shape == (7,)
        assert bool(jnp.all(jnp.isfinite(lp)))

    def test_sampling(self):
        flow = RealNVP(dim=6, n_coupling=2, hidden=(16,))
        x = jnp.zeros((1, 6))
        cond = jnp.zeros((1, 1))
        params = flow.init(KEY, x, cond)
        samples = flow.apply(
            params, jax.random.PRNGKey(5), jnp.array([0.3]), 9,
            method=RealNVP.sample,
        )
        assert samples.shape == (9, 6)


class TestSeq:
    def test_lstm_predictor(self):
        m = LSTMPredictor(out_dim=120, hidden_size=32)
        w = jax.random.normal(KEY, (3, 15, 120))
        params = m.init(KEY, w)
        out = m.apply(params, w)
        assert out.shape == (3, 120)

    def test_lstm_nll(self):
        m = LSTMNLLPredictor(out_dim=6, hidden_size=16)
        w = jax.random.normal(KEY, (4, 10, 6))
        params = m.init(KEY, w)
        mu, sigma = m.apply(params, w)
        assert mu.shape == sigma.shape == (4, 6)
        assert bool(jnp.all(sigma > 0))
        nll = gaussian_nll(mu, sigma, jnp.zeros_like(mu))
        assert jnp.isfinite(nll)

    def test_seq2seq(self):
        m = Seq2Seq(out_dim=30, hidden_size=16, noise_dim=4)
        w = jax.random.normal(KEY, (2, 5, 30))
        params = m.init(KEY, w, jax.random.PRNGKey(1), 7)
        out = m.apply(params, w, jax.random.PRNGKey(2), 7)
        assert out.shape == (2, 7, 30)


class TestGAT:
    def test_simulator_forward(self):
        m = GATSimulator(latent=16, n_processors=2, k=5)
        pos = jax.random.normal(KEY, (20, 3)) * 3
        nodes = jnp.concatenate([pos, jnp.zeros((20, 6))], axis=-1)
        params = m.init(KEY, nodes, pos)
        acc = m.apply(params, nodes, pos)
        assert acc.shape == (20, 3)

    def test_rollout(self):
        from molecular_dynamics_tpu.models.gat import gns_rollout

        m = GATSimulator(latent=8, n_processors=1, k=4)
        pos = jax.random.normal(KEY, (10, 3)) * 3
        hist = jnp.zeros((2, 10, 3))
        nodes = jnp.concatenate([pos, hist[0], hist[1]], axis=-1)
        params = m.init(KEY, nodes, pos)
        traj = gns_rollout(m, params, pos, hist, n_steps=5, dt=0.1)
        assert traj.shape == (5, 10, 3)


class TestTransformer:
    def test_forward(self):
        m = TrajectoryTransformer(out_dim=5, d_model=16, n_heads=2, n_layers=2)
        w = jax.random.normal(KEY, (3, 11, 5))
        params = m.init(KEY, w)
        out = m.apply(params, w)
        assert out.shape == (3, 5)
