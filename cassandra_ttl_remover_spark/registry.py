"""Format-version strategy registry (SURVEY.md §2.1 M3).

The reference dispatches its per-Cassandra-version remover implementation by
Java ServiceLoader — exactly one SSTableTTLRemover on the classpath
(TTLRemoverCLI.java:131-145, registrations under META-INF/services). The
Python analog is a small registry keyed by format version; versions share
the same logical transform and differ only in schema conventions (mirroring
how C2 strips at decode time while C3/4 strip at rebuild time yet must
converge — SURVEY.md §2.3.4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from cassandra_ttl_remover_spark.operators.liveness import strip_ttl, strip_ttl_cells


@dataclass(frozen=True)
class FormatStrategy:
    version: str
    description: str
    strip: Callable[[DataFrame], DataFrame]


_REGISTRY: dict[str, FormatStrategy] = {}


def register(strategy: FormatStrategy) -> None:
    if strategy.version in _REGISTRY:
        raise ValueError(f"duplicate strategy for version {strategy.version!r}")
    _REGISTRY[strategy.version] = strategy


def get_strategy(version: str) -> FormatStrategy:
    """Resolve exactly one strategy (the reference errors on zero or
    multiple implementations — TTLRemoverCLI.java:137-143)."""
    try:
        return _REGISTRY[version]
    except KeyError:
        raise LookupError(
            f"no TTL-removal strategy for version {version!r}; "
            f"registered: {sorted(_REGISTRY)}"
        ) from None


def registered_versions() -> list[str]:
    return sorted(_REGISTRY)


# The four reference format generations (README.adoc:17-20). Flat convention
# mirrors C2's decode-time strip; cell-struct convention mirrors C3/4/4.1's
# rebuild-time strip. Both converge to the same logical output (§2.3.4).
register(FormatStrategy("2", "flat columns, decode-time strip", strip_ttl))
register(FormatStrategy("3", "cell structs, rebuild-time strip", strip_ttl_cells))
register(FormatStrategy("4", "cell structs, rebuild-time strip", strip_ttl_cells))
register(FormatStrategy("4.1", "cell structs, rebuild-time strip", strip_ttl_cells))
