"""Train state: params, batch stats, optimizer state, step — one pytree.

The Lightning-module state of the reference (pig/models.py:223-325 +
pig/optimization.py state dicts) becomes a single functional pytree that jit
can donate and shard.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   tx=tx)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1,
                            params=new_params,
                            batch_stats=(new_batch_stats
                                         if new_batch_stats is not None
                                         else self.batch_stats),
                            opt_state=new_opt)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
