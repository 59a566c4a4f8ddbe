"""ClusterMonitor (A21/A24 analog): membership refresh, churn math, lifecycle."""

from __future__ import annotations

import time

from rubix_spark.cache.cluster import ClusterMonitor


def test_initial_membership_and_noop_refresh(spark):
    m = ClusterMonitor(spark)
    assert m.nodes  # local mode: the driver host
    assert m.refresh() is False  # same executors → no change
    s = m.stats()
    assert s["refreshes"] == 1 and s["changes"] == 0


def test_single_node_join_remaps_about_one_nth(spark):
    """Rendezvous property the cache depends on: adding 1 of n+1 nodes remaps ~1/(n+1)
    of ownership keys — NOT a full reshuffle (what makes churn survivable at scale)."""
    m = ClusterMonitor(spark, sample_keys=512)
    m._apply(["node-a", "node-b", "node-c"])
    assert m._apply(["node-a", "node-b", "node-c", "node-d"]) is True
    frac = m.stats()["last_remap_fraction"]
    assert 0.10 <= frac <= 0.45, frac  # ~0.25 expected at n=4
    # and a node LOSS remaps only the lost node's share
    m._apply(["node-a", "node-b", "node-c"])
    frac = m.stats()["last_remap_fraction"]
    assert 0.10 <= frac <= 0.45, frac


def test_on_change_hook_and_background_loop(spark):
    seen = []
    m = ClusterMonitor(spark, interval=0.05, on_change=lambda old, new: seen.append((old, new)))
    m._apply(["x", "y"])
    assert seen and seen[-1][1] == ["x", "y"]
    m.start()
    time.sleep(0.3)  # a few background refreshes against the live session
    m.stop()
    assert m.stats()["refreshes"] >= 3
    # live session's real host set was re-adopted by the loop
    assert m.nodes and m.nodes != ["x", "y"]
