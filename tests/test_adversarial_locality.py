"""Adversarial membership/locality schedules (the r12 adversarial method applied to
the ring + cluster-monitor layer, r13): generated churn sequences and orchestrated
hook races against the exact rendezvous-hashing contracts.

Defects found while building it (fixed in the same commit, invariant-32 class):
 - ClusterMonitor delivered ``on_change`` OUTSIDE the state lock with no ordering,
   so a refresh that lost the race could push a STALE node list over a newer one —
   the shim would then fabricate locations over dead hosts until the next churn.
   Delivery is now generation-stamped at-most-once-per-gen, newest-wins.
 - An all-executors-gone poll adopted the empty set, making every locate_key
   caller raise until the next poll; the monitor now keeps the last live ring.
 - ``shim_confs([])`` built confs that silently disable location fabrication
   JVM-side; it now fails at session build.

The exact properties pinned (the reason rendezvous was chosen over a virtual-node
ring — SURVEY §2.A A12):
 - LEAVE remaps ONLY the departed node's keys (survivors never trade keys).
 - JOIN moves keys ONLY onto the new node (survivors never trade keys).
 - Ownership is a pure function of the FINAL membership — history-independent.
"""

from __future__ import annotations

import random
import threading

import pytest

from rubix_spark.cache.ring import locate_key, split_owners
from rubix_spark.cache.cluster import ClusterMonitor


def _nodes(rng: random.Random, n: int) -> list[str]:
    return [f"host-{rng.randrange(10_000)}.dc{i % 3}" for i in range(n)]


def _keys(rng: random.Random, n: int = 200) -> list[str]:
    return [f"s3://bucket/part-{rng.randrange(1_000_000)}.parquet{i}" for i in range(n)]


# --------------------------------------------------------------- ring contracts
@pytest.mark.parametrize("seed", range(8))
def test_ring_leave_remaps_only_lost_keys(seed):
    rng = random.Random(seed)
    nodes = sorted(set(_nodes(rng, rng.randint(3, 12))))
    keys = _keys(rng)
    before = {k: locate_key(k, nodes) for k in keys}
    lost = rng.choice(nodes)
    survivors = [n for n in nodes if n != lost]
    moved = 0
    for k in keys:
        after = locate_key(k, survivors)
        if before[k] == lost:
            moved += 1
            assert after != lost
        else:
            # a survivor's key NEVER moves on someone else's departure
            assert after == before[k], (k, lost)
    # the remap fraction is exactly the departed node's share — no collateral churn
    assert moved == sum(1 for o in before.values() if o == lost)


@pytest.mark.parametrize("seed", range(8))
def test_ring_join_moves_keys_only_to_new_node(seed):
    rng = random.Random(100 + seed)
    nodes = sorted(set(_nodes(rng, rng.randint(2, 10))))
    keys = _keys(rng)
    before = {k: locate_key(k, nodes) for k in keys}
    joined = "host-new-joiner.dc9"
    grown = nodes + [joined]
    for k in keys:
        after = locate_key(k, grown)
        assert after == before[k] or after == joined, k


@pytest.mark.parametrize("seed", range(4))
def test_split_ownership_is_history_independent(seed):
    """A random add/drop schedule ends at some membership; split ownership there
    must equal a fresh computation from that membership alone (no path dependence
    a caller could accidentally memoize)."""
    rng = random.Random(200 + seed)
    nodes = sorted(set(_nodes(rng, 6)))
    live = list(nodes)
    for _ in range(rng.randint(3, 10)):
        if len(live) > 2 and rng.random() < 0.5:
            live.remove(rng.choice(live))
        else:
            live.append(f"host-j{rng.randrange(10_000)}.dc4")
        # owners are consulted mid-schedule, as a scan planner would
        split_owners("s3://bucket/big.parquet", 10 * 256 << 20, live)
    assert split_owners("s3://bucket/big.parquet", 10 * 256 << 20, live) == \
        split_owners("s3://bucket/big.parquet", 10 * 256 << 20, list(live))


# ------------------------------------------------------- monitor hook ordering
class _BareMonitor(ClusterMonitor):
    """ClusterMonitor without a SparkSession: seeds membership directly."""

    def __init__(self, nodes, on_change=None):  # noqa: super-init-not-called
        self._interval = 1e9
        self._sample = [f"__ring_probe_{i}" for i in range(64)]
        self._on_change = on_change
        self._stop = threading.Event()
        self._thread = None
        self._lock = threading.Lock()
        self.nodes = list(nodes)
        self._stats = {"refreshes": 0, "changes": 0, "empty_polls": 0,
                       "last_remap_fraction": 0.0}
        self._gen = 0
        self._delivered_gen = 0
        self._hook_lock = threading.Lock()


def test_stale_hook_delivery_is_skipped():
    """The deterministic pin of the race: a delivery carrying an OLDER generation
    than one already delivered must be dropped, so the last push always reflects
    the newest adopted membership (pre-fix, the stale push won and the shim hashed
    over dead hosts until the next churn)."""
    delivered = []
    mon = _BareMonitor(["a"], on_change=lambda old, new: delivered.append(list(new)))
    mon._deliver(2, ["a"], ["a", "b"], mon._on_change)   # newer delivery wins the race
    mon._deliver(1, ["a"], ["a", "c"], mon._on_change)   # the loser arrives late
    assert delivered == [["a", "b"]]


def test_serialized_hook_race_ends_on_newest_membership():
    """Two concurrent _apply calls with a slow hook: delivery is serialized and the
    LAST delivered membership equals the monitor's final node set."""
    delivered = []
    in_hook = threading.Event()
    release = threading.Event()

    def hook(old, new):
        if new == ["a", "b"]:
            in_hook.set()
            assert release.wait(10)
        delivered.append(list(new))

    mon = _BareMonitor(["a"], on_change=hook)
    t1 = threading.Thread(target=mon._apply, args=(["a", "b"],))
    t1.start()
    assert in_hook.wait(10)
    t2 = threading.Thread(target=mon._apply, args=(["a", "b", "c"],))
    t2.start()
    release.set()
    t1.join(10), t2.join(10)
    assert delivered[-1] == ["a", "b", "c"] == mon.nodes
    assert delivered == [["a", "b"], ["a", "b", "c"]]


@pytest.mark.parametrize("seed", range(6))
def test_membership_storm_last_delivery_is_newest(seed):
    """Thread storm of random memberships: whatever interleaving happens, the last
    hook delivery must equal the monitor's final adopted membership, and delivered
    generations must strictly increase (no stale overwrite, no duplicate)."""
    rng = random.Random(300 + seed)
    log: list[list[str]] = []
    lock = threading.Lock()

    def hook(old, new):
        with lock:
            log.append(list(new))

    mon = _BareMonitor(["seed-node"], on_change=hook)
    sets = [sorted(set(_nodes(rng, rng.randint(1, 6)))) for _ in range(24)]

    def worker(chunk):
        for s in chunk:
            mon._apply(s)

    threads = [threading.Thread(target=worker, args=(sets[i::4],)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(20)
    assert log, "storm applied no change"
    assert log[-1] == mon.nodes
    # at-most-once, ordered: the delivered sequence has no repeats of a superseded
    # membership after a newer one (generation order == delivery order)
    assert mon._delivered_gen == mon._gen


def test_empty_membership_is_never_adopted():
    polls = []
    mon = _BareMonitor(["a", "b"], on_change=lambda o, n: polls.append(n))
    assert mon._apply([]) is False
    assert mon.nodes == ["a", "b"]
    assert mon.stats()["empty_polls"] == 1
    assert polls == []
    # keys stay locatable throughout the outage window
    assert locate_key("k", mon.nodes) in ("a", "b")


def test_shim_confs_reject_empty_nodes():
    from rubix_spark.cache.locality import shim_confs

    with pytest.raises(ValueError):
        shim_confs([])
