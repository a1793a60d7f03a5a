"""Render-function registry.

The reference registers ~190 functions name->object at init
(``expr/metadata/metadata.go:58-118``, glue at ``expr/functions/glue.go``);
we do the same with a module-level dict filled by the ``@register``
decorator. Each implementation has signature

    fn(ctx: EvalContext, exp: Expr, from_ts: int, until_ts: int) -> SeriesFrame

and composes lazy DataFrame transformations only.
"""

from __future__ import annotations

from collections.abc import Callable

REGISTRY: dict[str, Callable] = {}


def register(*names: str):
    def deco(fn):
        for n in names:
            REGISTRY[n] = fn
        return fn
    return deco


def load_all() -> None:
    """Import every function family (the glue.go analog)."""
    from carbonapi_spark.functions import (  # noqa: F401
        aggregate,
        alias,
        extras,
        filters,
        joins,
        misc,
        sortlimit,
        stats,
        synth,
        timeshift,
        transform,
        windowed,
    )


load_all()
