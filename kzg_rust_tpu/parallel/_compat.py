"""shard_map compatibility shim.

jax >= 0.8 promoted ``shard_map`` out of ``jax.experimental`` and renamed
``check_rep`` to ``check_vma``; older jax only has the experimental one.
One wrapper so every sharded kernel imports from a single place and the
package tracks the API move without a deprecation warning per call.
"""

from __future__ import annotations

import inspect


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
    try:
        from jax import shard_map as _sm
    except ImportError:  # pragma: no cover - jax < 0.8
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=check_rep
        )
    params = inspect.signature(_sm).parameters
    kw = {"mesh": mesh, "in_specs": in_specs, "out_specs": out_specs}
    if "check_rep" in params:  # pragma: no cover - transitional versions
        kw["check_rep"] = check_rep
    elif "check_vma" in params:
        kw["check_vma"] = check_rep
    return _sm(f, **kw)
