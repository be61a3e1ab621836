"""Interactive rendering (reference `pretty.py:18-28`): register
treescope as the notebook display hook so every Pytree renders richly."""


def pretty() -> None:
    """Enable treescope rendering for interactive sessions/notebooks."""
    try:
        import treescope

        treescope.register_as_default()
        treescope.active_autovisualizer.set_globally(
            treescope.ArrayAutovisualizer()
        )
    except ImportError:  # pragma: no cover
        import warnings

        warnings.warn("treescope is not installed; pretty() is a no-op.")
