"""Namespace alias mirroring the reference's `genjax.generative_functions`
package layout (languages + combinators + distributions)."""

from genjax_tpu.combinators import *  # noqa: F401,F403
from genjax_tpu.combinators import __all__ as _cmb_all
from genjax_tpu.distributions import *  # noqa: F401,F403
from genjax_tpu.distributions import __all__ as _dist_all
from genjax_tpu.distributions.discrete_hmm import (
    DiscreteHMM,
    DiscreteHMMConfiguration,
    forward_filtering_backward_sampling,
)
from genjax_tpu.lang import *  # noqa: F401,F403
from genjax_tpu.lang import __all__ as _lang_all

__all__ = [  # noqa: PLE0604
    *_cmb_all,
    *_dist_all,
    *_lang_all,
    "DiscreteHMM",
    "DiscreteHMMConfiguration",
    "forward_filtering_backward_sampling",
]
