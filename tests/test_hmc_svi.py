"""HMC + SVI tests on models with known posteriors (north-star engines)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cpprob_tpu as ct
from cpprob_tpu.distributions import Beta, Bernoulli, Gamma, Normal, Uniform
from cpprob_tpu.inference.hmc import hmc
from cpprob_tpu.inference.potential import flatten_model
from cpprob_tpu.inference.svi import svi
from cpprob_tpu.models import (
    gaussian_posterior_analytic,
    gaussian_unknown_mean,
    gaussian_unknown_mean_readme,
)


class TestPotential:
    def test_flatten_gaussian(self):
        flat = flatten_model(gaussian_unknown_mean, (3.0, 4.0))
        assert flat.dim == 1
        assert flat.latents[0].addr == "mu"
        # log_joint at mu=0: prior N(1,5var) + liks
        import scipy.stats as sps

        want = (
            sps.norm.logpdf(0.0, 1.0, np.sqrt(5))
            + sps.norm.logpdf(3.0, 0.0, np.sqrt(2))
            + sps.norm.logpdf(4.0, 0.0, np.sqrt(2))
        )
        got = float(flat.log_joint(jnp.zeros(1)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_gradient(self):
        flat = flatten_model(gaussian_unknown_mean, (3.0, 4.0))
        g = jax.grad(flat.log_joint)(jnp.zeros(1))
        # d/dmu [ -(mu-1)^2/10 - (3-mu)^2/4 - (4-mu)^2/4 ] at 0 = 1/5 + 3/2 + 2
        np.testing.assert_allclose(float(g[0]), 0.2 + 1.5 + 2.0, rtol=1e-4)

    def test_interval_transform_jacobian(self):
        def m():
            ct.sample(Uniform(2.0, 5.0), addr="x")

        flat = flatten_model(m, ())
        # integral check: log_joint(z) should be log pdf(x(z)) + log|dx/dz|
        z = jnp.array([0.3])
        x = flat.constrain(z)["x"]
        assert 2.0 < float(x) < 5.0
        from scipy.integrate import quad

        f = lambda zz: float(jnp.exp(flat.log_joint(jnp.array([zz]))))
        total, _ = quad(f, -10, 10)
        np.testing.assert_allclose(total, 1.0, atol=1e-4)

    def test_discrete_site_rejected(self):
        def m():
            ct.sample(Bernoulli(0.5), addr="b")

        with pytest.raises(ValueError, match="discrete/unsupported"):
            flatten_model(m, ())


class TestHMC:
    def test_conjugate_gaussian(self, key):
        res = hmc(
            gaussian_unknown_mean_readme,
            (3.0, 4.0),
            key,
            n_samples=1500,
            n_warmup=500,
            n_chains=4,
            max_leapfrog=8,
        )
        mus = np.asarray(res.samples["mu"]).reshape(-1)
        assert abs(mus.mean() - 2.32353) < 0.05
        assert abs(mus.var() - 1.05882) < 0.12
        assert float(res.accept_rate.mean()) > 0.6

    def test_positive_support_gamma(self, key):
        # lambda ~ Gamma(2, 1/2 scale); x_i ~ Exponential-like via Normal trick:
        # use Gamma-Normal: y ~ N(0, 1/sqrt(lam)) conjugacy is messy; instead
        # check HMC recovers a pure Gamma prior (no observes) moments.
        def m():
            lam = ct.sample(Gamma(3.0, 2.0), addr="lam")
            ct.predict(lam, "Lam")

        res = hmc(m, (), key, n_samples=2500, n_warmup=600, n_chains=4,
                  max_leapfrog=8)
        lam = np.asarray(res.samples["lam"]).reshape(-1)
        assert abs(lam.mean() - 6.0) < 0.35          # mean = 3*2
        assert abs(lam.var() - 12.0) < 2.5           # var = 3*4

    def test_beta_bernoulli(self, key):
        data = np.array([1, 1, 1, 0, 1, 1, 0, 1, 1, 1], np.int32)

        def m(y):
            p = ct.sample(Beta(2.0, 2.0), addr="p")
            for i in range(y.shape[0]):
                ct.observe(Bernoulli(p), y[i], addr=f"y[{i}]")

        res = hmc(m, (data,), key, n_samples=1500, n_warmup=500, n_chains=4,
                  max_leapfrog=8)
        ps = np.asarray(res.samples["p"]).reshape(-1)
        # posterior Beta(2+8, 2+2) -> mean 10/14
        assert abs(ps.mean() - 10.0 / 14.0) < 0.03
        assert ps.min() > 0.0 and ps.max() < 1.0


class TestSVI:
    def test_conjugate_gaussian(self, key):
        res = svi(
            gaussian_unknown_mean_readme, (3.0, 4.0), key,
            steps=1500, n_mc=8, learning_rate=0.05,
        )
        samples = res.sample(jax.random.key(7), 20_000)["mu"]
        mus = np.asarray(samples)
        assert abs(mus.mean() - 2.32353) < 0.06
        assert abs(mus.var() - 1.05882) < 0.15
        # loss decreased
        assert float(res.losses[-50:].mean()) < float(res.losses[:50].mean())

    def test_multi_latent(self, key):
        pts = np.array(
            [[1, 2.1], [2, 3.9], [3, 5.3], [4, 7.7], [5, 10.2], [6, 12.9]],
            np.float32,
        )

        def m(points):
            a = ct.sample(Normal(0.0, 10.0), addr="a")
            b = ct.sample(Normal(0.0, 10.0), addr="b")
            for i in range(points.shape[0]):
                ct.observe(
                    Normal(a * points[i, 0] + b, 1.0), points[i, 1],
                    addr=f"y[{i}]",
                )

        res = svi(m, (pts,), key, steps=2000, learning_rate=0.05)
        s = res.sample(jax.random.key(3), 8000)
        a = float(np.mean(np.asarray(s["a"])))
        b = float(np.mean(np.asarray(s["b"])))
        assert abs(a - 2.16) < 0.25
        assert abs(b + 0.52) < 0.8


class TestSVIFullRank:
    """Full-rank ADVI (r5, VERDICT item 9): correlated-posterior oracle.

    Model: x ~ N(0, I_2); y | x ~ N(A x, sigma^2 I) with A = [[1,1],[0,1]].
    Analytic posterior: Sigma = (I + A^T A / s^2)^-1, mu = Sigma A^T y / s^2
    — strongly correlated, which the mean-field family cannot represent.
    """

    A = np.array([[1.0, 1.0], [0.0, 1.0]], np.float32)
    SIGMA_OBS = 0.5
    Y = np.array([1.5, -0.5], np.float32)

    @classmethod
    def _model(cls, y):
        x0 = ct.sample(Normal(0.0, 1.0), addr="x0")
        x1 = ct.sample(Normal(0.0, 1.0), addr="x1")
        ct.observe(Normal(x0 + x1, cls.SIGMA_OBS), y[0], addr="y0")
        ct.observe(Normal(x1, cls.SIGMA_OBS), y[1], addr="y1")

    @classmethod
    def _oracle(cls):
        prec = np.eye(2) + cls.A.T @ cls.A / cls.SIGMA_OBS**2
        cov = np.linalg.inv(prec)
        mu = cov @ cls.A.T @ cls.Y / cls.SIGMA_OBS**2
        return mu, cov

    def test_fullrank_recovers_correlation(self, key):
        mu, cov = self._oracle()
        res = svi(self._model, (jnp.asarray(self.Y),), key,
                  guide="fullrank", steps=3000, n_mc=16,
                  learning_rate=0.02)
        q_cov = np.asarray(res.covariance_unconstrained())
        q_mu = np.asarray(res.loc)
        # unconstrained space == support for Normal latents
        np.testing.assert_allclose(q_mu, mu, atol=0.08)
        np.testing.assert_allclose(q_cov, cov, atol=0.05)
        # the posterior correlation is strong and NEGATIVE; assert the
        # full-rank guide actually captured it (mean-field structurally
        # cannot: its off-diagonal is exactly 0)
        corr = q_cov[0, 1] / np.sqrt(q_cov[0, 0] * q_cov[1, 1])
        corr_true = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
        assert corr_true < -0.5
        assert abs(corr - corr_true) < 0.15
        mf = svi(self._model, (jnp.asarray(self.Y),), key,
                 guide="meanfield", steps=1500)
        assert float(np.asarray(mf.covariance_unconstrained())[0, 1]) == 0.0

    def test_csis_initialization(self, key):
        """Wire a trained CSIS proposal in as the SVI warm start: the
        guided posterior-mean estimate becomes init_loc, and the
        warm-started run must converge at least as well as cold."""
        from cpprob_tpu.inference.csis import CSIS

        engine = CSIS(gaussian_unknown_mean_readme, (0.0, 0.0))
        params, _ = engine.compile(jax.random.key(0), steps=150,
                                   batch_size=32)
        res_g = engine.infer(params, (3.0, 4.0), 2000, jax.random.key(1))
        init = jnp.asarray([float(res_g.mean("Mean"))])
        warm = svi(gaussian_unknown_mean_readme, (3.0, 4.0),
                   jax.random.key(2), steps=400, init_loc=init)
        cold = svi(gaussian_unknown_mean_readme, (3.0, 4.0),
                   jax.random.key(2), steps=400)
        assert abs(float(warm.loc[0]) - 2.32353) < 0.1
        assert (float(warm.losses[:25].mean())
                <= float(cold.losses[:25].mean()) + 0.5)

    def test_unknown_guide_raises(self, key):
        with pytest.raises(ValueError):
            svi(gaussian_unknown_mean_readme, (3.0, 4.0), key,
                guide="bogus")


class TestDiagnostics:
    def test_rhat_and_ess_on_iid_chains(self, key):
        import jax
        from cpprob_tpu.postprocess import (
            effective_sample_size,
            split_rhat,
            summarize_chains,
        )

        samples = jax.random.normal(key, (4, 500))
        rhat = float(split_rhat(samples))
        assert abs(rhat - 1.0) < 0.05
        ess = float(effective_sample_size(samples))
        assert ess > 1000  # iid draws: ESS ~ total draws
        s = summarize_chains(samples)
        assert abs(float(s["mean"])) < 0.1

    def test_rhat_detects_nonmixing(self, key):
        import jax.numpy as jnp
        from cpprob_tpu.postprocess import split_rhat

        # two chains stuck at different modes
        samples = jnp.stack([jnp.zeros(200), jnp.ones(200) * 5.0])
        samples = samples + 0.1 * jax.random.normal(key, (2, 200))
        assert float(split_rhat(samples)) > 2.0

    def test_ess_detects_autocorrelation(self, key):
        import jax.numpy as jnp
        import numpy as np
        from cpprob_tpu.postprocess import effective_sample_size

        rng = np.random.RandomState(0)
        x = np.zeros((2, 1000), np.float32)
        for c in range(2):
            for t in range(1, 1000):
                x[c, t] = 0.95 * x[c, t - 1] + rng.normal() * 0.3
        ess = float(effective_sample_size(jnp.asarray(x)))
        assert ess < 500  # strongly autocorrelated


class TestPredictive:
    def test_posterior_predictive(self, key):
        from cpprob_tpu.inference.predictive import posterior_predictive
        from cpprob_tpu.inference.svi import svi

        res = svi(gaussian_unknown_mean_readme, (3.0, 4.0), key, steps=1500)
        samples = res.sample(jax.random.key(2), 4000)
        obs_rep, predicts = posterior_predictive(
            gaussian_unknown_mean_readme, (3.0, 4.0), samples,
            jax.random.key(3),
        )
        y1 = np.asarray(obs_rep["y1"])
        assert y1.shape == (4000,)
        # predictive mean ~ posterior mean; predictive var ~ post var + lik var
        assert abs(y1.mean() - 2.32353) < 0.2
        assert abs(y1.var() - (1.05882 + 4.0)) < 0.5

    def test_prior_predictive(self, key):
        from cpprob_tpu.inference.predictive import prior_predictive

        latents, obs = prior_predictive(
            gaussian_unknown_mean_readme, (0.0, 0.0), 8000, key
        )
        mu = np.asarray(latents["mu"])
        assert abs(mu.mean() - 1.0) < 0.1
        assert abs(mu.std() - 1.5) < 0.1
        y = np.asarray(obs["y1"])
        assert abs(y.var() - (1.5**2 + 4.0)) < 0.4
