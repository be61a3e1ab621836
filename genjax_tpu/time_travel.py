"""Time-travel debugger facade (reference `genjax.time_travel`)."""

from genjax_tpu.utils.time_travel import (
    TimeTravelingDebugger,
    rec,
    tag,
    time_machine,
)

__all__ = ["TimeTravelingDebugger", "rec", "tag", "time_machine"]
