"""`Environment`: a jaxpr var -> value store for custom interpreters
(reference `_src/core/compiler/interpreters/environment.py:24-81`).

Used by the ADEV CPS interpreter (`adev/core.py`) and exported for users
building their own interpreters."""

from typing import Any


class Environment:
    """Keeps track of variables and their values during jaxpr
    propagation."""

    def __init__(self, parent: dict | None = None):
        self.env: dict[int, Any] = dict(parent) if parent else {}

    def read(self, var) -> Any:
        from jax.extend.core import Literal

        if isinstance(var, Literal):
            return var.val
        return self.env[id(var)]

    def write(self, var, cell: Any) -> Any:
        self.env[id(var)] = cell
        return cell

    def __getitem__(self, var) -> Any:
        return self.read(var)

    def __setitem__(self, var, cell) -> None:
        self.write(var, cell)

    def __contains__(self, var) -> bool:
        from jax.extend.core import Literal

        if isinstance(var, Literal):
            return True
        return id(var) in self.env

    def copy(self) -> "Environment":
        return Environment(self.env)
