"""Dirichlet-mixture Gibbs (models/gmm.py; reference application
notebook update/7): exact-conditional moves keep the trace score exact,
and the chain recovers well-separated clusters."""

import jax
import jax.numpy as jnp

from genjax_tpu import ChoiceMap
from genjax_tpu.models.gmm import make_gmm, run_gibbs, simulate_gmm_data

TRUE_MEANS = jnp.array([-5.0, 0.0, 5.0])
TRUE_PROBS = jnp.array([0.25, 0.5, 0.25])


class TestGibbsGMM:
    def setup_method(self):
        self.true_idx, self.obs = simulate_gmm_data(
            jax.random.key(0), 300, TRUE_MEANS, TRUE_PROBS
        )
        self.trace = run_gibbs(jax.random.key(1), self.obs, k=3, n_sweeps=100)

    def test_trace_score_stays_exact(self):
        """After 100 sweeps of Update edits, the trace score equals a
        fresh assess of its choices (no drift through the edit path)."""
        model = make_gmm(3, 300)
        score, _ = model.assess(self.trace.get_choices(), ())
        assert jnp.allclose(self.trace.get_score(), score, atol=1e-2, rtol=1e-5)

    def test_recovers_cluster_means(self):
        means = jnp.sort(self.trace.get_choices()["means"])
        assert jnp.all(jnp.abs(means - TRUE_MEANS) < 0.3), means

    def test_recovers_weights(self):
        # weights sorted by the sorted-means permutation
        chm = self.trace.get_choices()
        order = jnp.argsort(chm["means"])
        probs = chm["probs"][order]
        assert jnp.all(jnp.abs(probs - TRUE_PROBS) < 0.12), probs

    def test_assignment_accuracy(self):
        chm = self.trace.get_choices()
        order = jnp.argsort(jnp.argsort(chm["means"]))
        relabeled = order[chm["idx"]]
        accuracy = jnp.mean(relabeled == self.true_idx)
        assert accuracy > 0.95, accuracy

    def test_observations_stay_pinned(self):
        assert jnp.array_equal(self.trace.get_choices()["obs"], self.obs)
