"""LinearGaussianSSM (Kalman filter / RTS smoother / exact LML) against
independent oracles: the scalar recursions used across this test suite,
and — for the multivariate case — the dense joint-Gaussian density of
the stacked observation vector built directly from the model matrices."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.inference.kalman import LinearGaussianSSM

from test_kalman_oracle import kalman_lml  # scalar oracle


def dense_joint_lml(A, Q, H, R, mu0, P0, ys):
    """log N(vec(y); mean, Sigma) built densely — an oracle independent
    of any filtering recursion. O(T^2 d^2) memory; small T only."""
    T, p = ys.shape
    d = A.shape[0]
    # state means and marginal covariances
    means = [mu0]
    covs = [P0]
    for _ in range(T - 1):
        means.append(A @ means[-1])
        covs.append(A @ covs[-1] @ A.T + Q)
    # cross covariances cov(z_s, z_t) = covs[s] @ (A^{t-s})^T for t >= s
    Sz = np.zeros((T * d, T * d))
    for s in range(T):
        acc = covs[s]
        for t in range(s, T):
            Sz[s * d : (s + 1) * d, t * d : (t + 1) * d] = acc
            Sz[t * d : (t + 1) * d, s * d : (s + 1) * d] = acc.T
            acc = acc @ A.T
    Hbig = np.kron(np.eye(T), H)
    Sy = Hbig @ Sz @ Hbig.T + np.kron(np.eye(T), R)
    mean_y = Hbig @ np.concatenate(means)
    resid = ys.reshape(-1) - mean_y
    sign, logdet = np.linalg.slogdet(Sy)
    assert sign > 0
    return float(
        -0.5 * resid @ np.linalg.solve(Sy, resid)
        - 0.5 * logdet
        - 0.5 * T * p * np.log(2 * np.pi)
    )


class TestScalarAgainstSuiteOracle:
    def test_lml_matches(self):
        ys = jnp.array([0.3, 1.0, 0.5, -0.2, 0.8, 1.4, 0.9, 0.1])
        m = LinearGaussianSSM.build(a=0.9, q=0.5, h=1.0, r=0.4, d=1)
        assert abs(float(m.lml(ys[:, None])) - float(
            kalman_lml(0.9, 0.5, 0.4, ys)
        )) < 1e-4

    def test_smoother_last_step_equals_filter(self):
        ys = jnp.array([0.3, 1.0, 0.5, -0.2])
        m = LinearGaussianSSM.build(a=0.8, q=0.3, h=1.0, r=0.5, d=1)
        mus, Ps, _ = m.filter(ys[:, None])
        ms, Ss = m.smooth(ys[:, None])
        assert jnp.allclose(ms[-1], mus[-1], atol=1e-6)
        assert jnp.allclose(Ss[-1], Ps[-1], atol=1e-6)
        # smoothing never increases marginal variance
        assert bool(jnp.all(Ss[:, 0, 0] <= Ps[:, 0, 0] + 1e-6))


class TestVectorInputs:
    def test_vector_a_and_q_mean_diagonal(self):
        """Regression: 1-D array inputs to build() must become diagonal
        matrices — passed through raw, A @ mu is an inner product and
        the covariances silently broadcast-corrupt."""
        m_vec = LinearGaussianSSM.build(
            a=jnp.array([0.9, 0.8]), q=jnp.array([0.5, 0.3]),
            h=1.0, r=0.4, d=2,
        )
        m_mat = LinearGaussianSSM.build(
            a=jnp.diag(jnp.array([0.9, 0.8])),
            q=jnp.diag(jnp.array([0.5, 0.3]) ** 2),
            h=1.0, r=0.4, d=2,
        )
        assert jnp.allclose(m_vec.A, m_mat.A)
        assert jnp.allclose(m_vec.Q, m_mat.Q)
        _, ys = m_mat.sample(jax.random.key(0), 10)
        assert jnp.allclose(m_vec.lml(ys), m_mat.lml(ys), atol=1e-5)


class TestMultivariateAgainstDenseJoint:
    def setup_method(self):
        self.m = LinearGaussianSSM.build(
            a=jnp.array([[0.9, 0.1], [0.0, 0.8]]),
            q=0.3,
            h=jnp.array([[1.0, 0.0]]),
            r=0.5,
            d=2,
            p=1,
        )

    def test_lml_matches_dense_joint(self):
        _, ys = self.m.sample(jax.random.key(0), 6)
        exact = dense_joint_lml(
            np.asarray(self.m.A),
            np.asarray(self.m.Q),
            np.asarray(self.m.H),
            np.asarray(self.m.R),
            np.asarray(self.m.mu0),
            np.asarray(self.m.P0),
            np.asarray(ys),
        )
        assert abs(float(self.m.lml(ys)) - exact) < 1e-3, (
            float(self.m.lml(ys)),
            exact,
        )

    def test_smoother_covariance_dominates_and_stays_psd(self):
        # The theorem is about COVARIANCES (P_filter - P_smooth is PSD at
        # every t); realized RMSE on one sample path can go either way.
        _, ys = self.m.sample(jax.random.key(1), 60)
        _, Ps, _ = jax.jit(self.m.filter)(ys)
        _, Ss = self.m.smooth(ys)
        assert bool(jnp.all(jnp.linalg.eigvalsh(Ss) > -1e-5))
        gap_eigs = jnp.linalg.eigvalsh(Ps - Ss)
        assert bool(jnp.all(gap_eigs > -1e-5)), float(jnp.min(gap_eigs))

    def test_smoother_beats_filter_in_expectation(self):
        # averaged over realizations the smoothed means ARE closer
        keys = jax.random.split(jax.random.key(2), 20)

        def one(k):
            zs, ys = self.m.sample(k, 60)
            mus, _, _ = self.m.filter(ys)
            ms, _ = self.m.smooth(ys)
            return (
                jnp.mean((mus - zs) ** 2),
                jnp.mean((ms - zs) ** 2),
            )

        filt_mse, smooth_mse = jax.vmap(one)(keys)
        assert float(jnp.mean(smooth_mse)) < float(jnp.mean(filt_mse))
