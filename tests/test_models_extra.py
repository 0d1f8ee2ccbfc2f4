"""Extended model-zoo members: SDE-GAN, SchNet, AEs, hybrids, NODE, eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

KEY = jax.random.PRNGKey(0)


class TestSDEGAN:
    def test_generator_paths(self):
        from molecular_dynamics_tpu.models.sde import SDEGenerator

        gen = SDEGenerator(data_dim=12, latent_dim=8, noise_dim=4, hidden=(16,))
        ts = jnp.linspace(0.0, 1.0, 6)
        params = gen.init(KEY, KEY, ts, 3)
        paths = gen.apply(params, jax.random.PRNGKey(1), ts, 3)
        assert paths.shape == (3, 6, 12)
        assert bool(jnp.all(jnp.isfinite(paths)))
        # different noise -> different paths
        paths2 = gen.apply(params, jax.random.PRNGKey(2), ts, 3)
        assert float(jnp.max(jnp.abs(paths - paths2))) > 1e-6

    def test_discriminator_and_training_steps(self):
        from molecular_dynamics_tpu.models.sde import (
            CDEDiscriminator,
            SDEGenerator,
        )
        from molecular_dynamics_tpu.train.sde import (
            SDEGANConfig,
            make_sde_gan_trainer,
        )

        ts = jnp.linspace(0.0, 1.0, 5)
        gen = SDEGenerator(data_dim=6, latent_dim=8, noise_dim=2, hidden=(16,))
        disc = CDEDiscriminator(data_dim=6, hidden_dim=8, f_hidden=(16,))
        init_fn, opts, g_step, d_step, informed, swa = make_sde_gan_trainer(
            gen, disc, ts, config=SDEGANConfig()
        )
        g_params, d_params = init_fn(KEY, 3)
        g_opt = opts[0].init(g_params)
        d_opt = opts[1].init(d_params)
        real = jax.random.normal(jax.random.PRNGKey(3), (3, 5, 6))
        g_params, g_opt, gl = g_step(g_params, g_opt, d_params, KEY, real)
        d_params, d_opt, dl = d_step(d_params, d_opt, g_params, KEY, real)
        assert np.isfinite(float(gl)) and np.isfinite(float(dl))
        # critic weights clamped
        maxw = max(
            float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(d_params)
        )
        assert maxw <= 0.98 + 1e-6
        avg = swa(g_params, g_params, 0)
        assert jax.tree.structure(avg) == jax.tree.structure(g_params)

    def test_time_conditioned_gan(self):
        """cond_dim > 0 (MDX_SDE_TEMB): the context must enter generator
        and critic (different cond -> different paths/scores) and the
        trainer must step finitely with conds attached."""
        from molecular_dynamics_tpu.models.sde import (
            CDEDiscriminator,
            SDEGenerator,
        )
        from molecular_dynamics_tpu.train.sde import (
            SDEGANConfig,
            make_sde_gan_trainer,
        )

        ts = jnp.linspace(0.0, 1.0, 5)
        gen = SDEGenerator(
            data_dim=6, latent_dim=8, noise_dim=2, hidden=(16,), cond_dim=3
        )
        disc = CDEDiscriminator(
            data_dim=6, hidden_dim=8, f_hidden=(16,), cond_dim=3
        )
        c0 = jnp.zeros((3, 3))
        c1 = jnp.ones((3, 3))
        init_fn, opts, g_step, d_step, _, _ = make_sde_gan_trainer(
            gen, disc, ts, config=SDEGANConfig()
        )
        g_params, d_params = init_fn(KEY, 3, c0)
        p0 = gen.apply(g_params, jax.random.PRNGKey(1), ts, 3, c0)
        p1 = gen.apply(g_params, jax.random.PRNGKey(1), ts, 3, c1)
        assert p0.shape == (3, 5, 6)
        # same noise, different condition -> different paths
        assert float(jnp.max(jnp.abs(p0 - p1))) > 1e-6
        s0 = disc.apply(d_params, p0, ts, c0)
        s1 = disc.apply(d_params, p0, ts, c1)
        assert float(jnp.max(jnp.abs(s0 - s1))) > 1e-8
        g_opt = opts[0].init(g_params)
        d_opt = opts[1].init(d_params)
        real = jax.random.normal(jax.random.PRNGKey(3), (3, 5, 6))
        g_params, g_opt, gl = g_step(g_params, g_opt, d_params, KEY, real, c0)
        d_params, d_opt, dl = d_step(d_params, d_opt, g_params, KEY, real, c0)
        assert np.isfinite(float(gl)) and np.isfinite(float(dl))

    def test_quantile_matching_aux(self):
        """quantile_weight adds the empirical-W1 marginal term: the g-loss
        must shift by exactly mean|sort(fake) - sort(real)| (same key ->
        same fake batch), and stay finite/differentiable."""
        from molecular_dynamics_tpu.models.sde import (
            CDEDiscriminator,
            SDEGenerator,
        )
        from molecular_dynamics_tpu.train.sde import (
            SDEGANConfig,
            make_sde_gan_trainer,
        )

        ts = jnp.linspace(0.0, 1.0, 5)
        gen = SDEGenerator(data_dim=6, latent_dim=8, noise_dim=2, hidden=(16,))
        disc = CDEDiscriminator(data_dim=6, hidden_dim=8, f_hidden=(16,))
        real = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 6))

        def g_loss(quantile_weight):
            init_fn, opts, g_step, _, _, _ = make_sde_gan_trainer(
                gen, disc, ts,
                config=SDEGANConfig(quantile_weight=quantile_weight),
            )
            g_params, d_params = init_fn(KEY, 4)
            g_opt = opts[0].init(g_params)
            new_params, _, gl = g_step(g_params, g_opt, d_params, KEY, real)
            return g_params, new_params, float(gl)

        g_params, _, base = g_loss(0.0)
        _, stepped, with_q = g_loss(1.0)
        fake = gen.apply(g_params, KEY, ts, 4)
        w1 = float(
            jnp.mean(jnp.abs(jnp.sort(fake, 0) - jnp.sort(real, 0)))
        )
        assert w1 > 0.0
        np.testing.assert_allclose(with_q - base, w1, rtol=1e-4)
        assert np.isfinite(
            max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(stepped))
        )


class TestSchNet:
    def test_forward(self):
        from molecular_dynamics_tpu.models.schnet import SchNet

        m = SchNet(features=16, n_interactions=2, out_dim=1)
        pos = jax.random.normal(KEY, (12, 3)) * 3
        types = jnp.arange(12) % 4
        params = m.init(KEY, pos, types)
        out = m.apply(params, pos, types)
        assert out.shape == (1,)
        g = jax.grad(lambda p: m.apply(params, p, types)[0])(pos)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_rbf_restores_long_range_gradient(self):
        """The reference's exp(-d) filter input underflows at range: with
        two atoms 20 A apart the positional gradient through the filter is
        ~exp(-20), so an HNN on it cannot represent the 13-33 A SMD pulling
        coordinate (measured: 9.06 A e2e rollout error). The Gaussian RBF
        expansion (rbf > 0) keeps filter sensitivity at all ranges."""
        from molecular_dynamics_tpu.models.schnet import SchNetHNN

        n = 4
        pos = jnp.zeros((n, 3)).at[1, 0].set(20.0).at[2, 1].set(1.5)
        pos = pos.at[3, 2].set(-1.5)
        x = jnp.concatenate([pos.reshape(-1), jnp.full(3 * n, 0.1)])

        def far_grad(rbf):
            m = SchNetHNN(n_atoms=n, features=16, n_interactions=2, rbf=rbf)
            params = m.init(KEY, x)
            g = jax.grad(lambda q: m.apply(params, q)[0])(x)
            # gradient wrt the far atom's coordinates
            return float(jnp.abs(g[3:6]).max())

        g_ref, g_rbf = far_grad(0), far_grad(32)
        assert g_rbf > 1e3 * g_ref, (g_ref, g_rbf)


class TestAutoencoders:
    def test_mlp_ae(self):
        from molecular_dynamics_tpu.models.autoencoder import MLPAutoencoder

        ae = MLPAutoencoder(in_dim=30, latent_dim=6, hidden=(32,))
        x = jax.random.normal(KEY, (4, 30))
        params = ae.init(KEY, x)
        recon, z = ae.apply(params, x)
        assert recon.shape == (4, 30) and z.shape == (4, 6)

    def test_latent_hnn(self):
        from molecular_dynamics_tpu.models.autoencoder import LatentHNN

        m = LatentHNN(in_dim=30, latent_dim=8, ae_hidden=(32,), hnn_hidden=(16,))
        x = jax.random.normal(KEY, (4, 30))
        params = m.init(KEY, x)
        recon, z, fields = m.apply(params, x)
        assert z.shape == (4, 8) and fields.shape == (4, 2)

    def test_aae_losses(self):
        import optax  # noqa: F401
        from molecular_dynamics_tpu.models.autoencoder import (
            LatentDiscriminator,
            MLPAutoencoder,
            aae_losses,
        )

        ae = MLPAutoencoder(in_dim=20, latent_dim=4, hidden=(16,))
        d = LatentDiscriminator(hidden=(16,))
        x = jax.random.normal(KEY, (8, 20))
        ap = ae.init(KEY, x)
        recon, z = ae.apply(ap, x)
        dp = d.init(KEY, z)
        fake_logits = d.apply(dp, z)
        real_logits = d.apply(dp, jax.random.normal(KEY, z.shape))
        rec, g_adv, d_loss = aae_losses(recon, x, fake_logits, real_logits)
        for v in (rec, g_adv, d_loss):
            assert np.isfinite(float(v))


class TestSeqVariants:
    def test_seq2seq_nll(self):
        from molecular_dynamics_tpu.models.seq import Seq2SeqNLL, gaussian_nll

        m = Seq2SeqNLL(out_dim=12, hidden_size=16, noise_dim=4)
        w = jax.random.normal(KEY, (2, 4, 12))
        params = m.init(KEY, w, jax.random.PRNGKey(1), 3)
        mu, sigma = m.apply(params, w, jax.random.PRNGKey(2), 3)
        assert mu.shape == sigma.shape == (2, 3, 12)
        assert bool(jnp.all(sigma > 0))
        assert np.isfinite(float(gaussian_nll(mu, sigma, jnp.zeros_like(mu))))

    def test_sequence_discriminator(self):
        from molecular_dynamics_tpu.models.seq import SequenceDiscriminator

        d = SequenceDiscriminator(hidden_size=16)
        seq = jax.random.normal(KEY, (3, 7, 12))
        params = d.init(KEY, seq)
        out = d.apply(params, seq)
        assert out.shape == (3,)


class TestHybrids:
    def test_lstm_gat(self):
        from molecular_dynamics_tpu.models.gat import LSTMGAT

        m = LSTMGAT(out_dim=3, hidden_size=16, latent=16, n_processors=1, k=4)
        hist = jax.random.normal(KEY, (10, 5, 6))
        pos = jax.random.normal(KEY, (10, 3)) * 3
        params = m.init(KEY, hist, pos)
        out = m.apply(params, hist, pos)
        assert out.shape == (10, 3)


class TestNODE:
    def test_rk4_and_odeint_agree(self):
        from molecular_dynamics_tpu.models.node import odeint_field, rk4_rollout

        field = lambda x, t: -x  # exponential decay
        x0 = jnp.ones((4,))
        traj = rk4_rollout(field, x0, n_steps=10, dt=0.1)
        expect = jnp.exp(-0.1 * jnp.arange(1, 11))[:, None] * x0
        np.testing.assert_allclose(np.asarray(traj), np.asarray(expect), rtol=1e-4)
        ts = jnp.linspace(0.0, 1.0, 11)
        sol = odeint_field(field, x0, ts)
        np.testing.assert_allclose(
            np.asarray(sol[-1]), np.exp(-1.0) * np.ones(4), rtol=1e-4
        )


class TestEvaluate:
    def test_e2e_statistics_and_compare(self, rng):
        from molecular_dynamics_tpu.evaluate import compare_e2e, e2e_statistics

        frames = rng.normal(0, 1, (50, 10, 3))
        frames[:, -1, 0] += np.linspace(5, 15, 50)  # growing e2e
        stats = e2e_statistics(frames, 0, -1, n_buckets=5)
        assert stats["mean"].shape == (5,)
        assert stats["mean"][-1] > stats["mean"][0]
        res = compare_e2e(frames, frames)
        assert res["mean_abs_error"] == 0.0

    def test_compare_e2e_short_trajectories_no_nan(self, rng):
        """Trajectories shorter than n_buckets coarsen the bucketing
        instead of producing empty buckets (NaN means), and both ensembles
        bucket at the same resolution."""
        from molecular_dynamics_tpu.evaluate import compare_e2e

        short = [rng.normal(0, 1, (3, 6, 3)) for _ in range(2)]
        long_t = [rng.normal(0, 1, (40, 6, 3)) for _ in range(2)]
        res = compare_e2e(
            np.concatenate(short), np.concatenate(long_t),
            data_trajectories=long_t, generated_trajectories=short,
        )
        for v in res.values():
            assert np.isfinite(v)

    def test_whitening_roundtrip(self, rng):
        from molecular_dynamics_tpu.evaluate import whiten, whiten_fit, unwhiten

        frames = rng.normal(3, 2, (20, 8, 3))
        mean, std = whiten_fit(frames)
        w = whiten(frames, mean, std)
        assert abs(w.reshape(20, -1).mean()) < 1e-10
        np.testing.assert_allclose(unwhiten(w, mean, std), frames, rtol=1e-10)


class TestTrajectoryAnalysis:
    def test_radius_of_gyration(self, rng):
        from molecular_dynamics_tpu.evaluate import radius_of_gyration

        # antipodal point pairs on a sphere of radius 5: COM exactly at the
        # centre, so Rg == 5
        v = rng.normal(0, 1, (100, 3))
        v = 5.0 * v / np.linalg.norm(v, axis=-1, keepdims=True)
        frame = np.concatenate([v, -v])[None]
        rg = radius_of_gyration(frame)
        assert rg.shape == (1,)
        assert abs(rg[0] - 5.0) < 1e-5

    def test_rmsf_rigid_motion_is_zero(self, rng):
        from molecular_dynamics_tpu.evaluate import rmsf

        base = rng.normal(0, 3, (15, 3))
        frames = []
        for k in range(6):
            th = 0.3 * k
            rot = np.array(
                [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
            )
            frames.append(base @ rot.T + k * np.array([1.0, 0, 0]))
        out = rmsf(np.stack(frames))
        assert out.shape == (15,)
        assert out.max() < 1e-6  # pure rigid motion -> no fluctuation


class TestGraphSeq2Seq:
    def test_shapes_and_graph_conditioning(self):
        import jax
        import jax.numpy as jnp

        from molecular_dynamics_tpu.models.gat import GraphSeq2Seq

        n, t, f = 12, 6, 5
        model = GraphSeq2Seq(hidden_size=16, k=4)
        key = jax.random.PRNGKey(0)
        window = jax.random.normal(key, (n, t, f))
        params = model.init(key, window, jax.random.PRNGKey(1), 3)
        out = model.apply(params, window, jax.random.PRNGKey(2), 3)
        assert out.shape == (n, 3, f)
        assert bool(jnp.isfinite(out).all())
        # noise-fed decoder: different keys give different rollouts
        out2 = model.apply(params, window, jax.random.PRNGKey(3), 3)
        assert float(jnp.abs(out - out2).max()) > 0.0

    def test_chained_rollout_refeature(self):
        """The refeature hook rebuilds derived channels of every decoded
        segment from its own geometry before feedback; the rollout must
        carry the rebuilt channels, and stay finite/jittable."""
        import jax
        import jax.numpy as jnp

        from molecular_dynamics_tpu.models.gat import GraphSeq2Seq
        from molecular_dynamics_tpu.train.seq import (
            graph_chained_decode_rollout,
        )

        n, t, f = 8, 6, 5
        model = GraphSeq2Seq(hidden_size=16, k=4)
        key = jax.random.PRNGKey(0)
        window = jax.random.normal(key, (n, t, f))
        params = model.init(key, window, jax.random.PRNGKey(1), 3)

        def refeature(seg):  # pin the derived channels to a marker value
            return seg.at[..., 3:].set(0.25)

        roll = jax.jit(
            lambda p, w, k: graph_chained_decode_rollout(
                model, p, w, k, decode_len=3, n_steps=9,
                refeature=refeature,
            )
        )(params, window, jax.random.PRNGKey(2))
        assert roll.shape == (9, n, f)
        assert bool(jnp.isfinite(roll).all())
        assert float(jnp.abs(roll[..., 3:] - 0.25).max()) == 0.0
