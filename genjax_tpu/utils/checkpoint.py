"""Checkpoint/resume for inference state.

The reference has no checkpointing (SURVEY.md §5); since every piece of
inference state in this framework (traces, particle collections, chain
states, variational parameters) is a JAX pytree, orbax checkpointing
composes directly. These helpers save/restore arbitrary state pytrees,
preserving shardings on restore when a target structure is provided.
"""

from typing import Any


def save_checkpoint(path: str, state: Any) -> None:
    """Serialize an inference-state pytree (trace, ParticleCollection,
    chain states, ...) to `path`."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a state pytree saved with `save_checkpoint`. `target` is a
    pytree of the same structure (values used for shape/dtype/sharding)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, target)
