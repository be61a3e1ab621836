"""genjax_tpu: a TPU-native probabilistic programming framework.

A from-scratch implementation of the Gen generative function interface
(GFI) on JAX/XLA/Pallas, designed for TPU hardware: dense pytree traces,
handler-based `@gen` tracing (no jaxpr interpretation on GFI paths), a
native distribution library, vectorized+sharded inference (SIR/SMC with
distributed resampling, MCMC, VI/ADEV), and Pallas kernels for inference
hot loops.

Capability reference: genjax-community/genjax (see SURVEY.md).
"""

from genjax_tpu.core import *  # noqa: F401,F403
from genjax_tpu.core import __all__ as _core_all
from genjax_tpu.distributions import *  # noqa: F401,F403
from genjax_tpu.distributions import __all__ as _dist_all
from genjax_tpu.lang import *  # noqa: F401,F403
from genjax_tpu.lang import __all__ as _lang_all

try:
    from genjax_tpu.combinators import *  # noqa: F401,F403
    from genjax_tpu.combinators import __all__ as _cmb_all
except ImportError:  # pragma: no cover - during staged bring-up
    _cmb_all = []

try:
    from genjax_tpu import inference  # noqa: F401
    from genjax_tpu.inference.sp import Algorithm, Marginal, Target, marginal  # noqa: F401

    _inf_all = ["Algorithm", "Marginal", "Target", "inference", "marginal"]
except ImportError:  # pragma: no cover
    _inf_all = []

try:
    from genjax_tpu import adev  # noqa: F401

    _adev_all = ["adev"]
except ImportError:  # pragma: no cover
    _adev_all = []

try:
    from genjax_tpu.utils.pretty import pretty  # noqa: F401

    _util_all = ["pretty"]
except ImportError:  # pragma: no cover
    _util_all = []

__version__ = "0.1.0"

__all__ = [  # noqa: PLE0604
    *_core_all,
    *_dist_all,
    *_lang_all,
    *_cmb_all,
    *_inf_all,
    *_adev_all,
    *_util_all,
]
