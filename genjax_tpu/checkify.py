"""Runtime-check gate facade (reference `genjax.checkify`)."""

from genjax_tpu.core.checkify import do_checkify, optional_check, should_check

__all__ = ["do_checkify", "optional_check", "should_check"]
