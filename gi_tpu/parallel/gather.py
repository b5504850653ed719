"""Ring-exchange gather over a device-sharded photon map (SURVEY.md §2.3 P8).

The reference keeps its whole photon map in shared memory and every thread
reads it freely (photonmap.cpp:364-377).  The replicated-map equivalent is
fine up to ~10M photons (30 B/photon, README.md:309-312), but a sharded map
is the long-context analogue SURVEY §5 calls for: photons stay distributed
across devices (each holds N/D of them) and radiance/irradiance queries are
answered by rotating the photon shards around the mesh ring with
`lax.ppermute` — ring attention's KV rotation, with "attention scores"
replaced by a running k-nearest-neighbor merge.

Per ring step each device:
  1. merges its resident photon shard into every local query's running
     top-K buffer (distance² + payload flux/incident carried along, so no
     global photon index ever needs to be resolved);
  2. ppermutes the shard to the next device on the ring (ICI
     neighbor-exchange; bandwidth per step = shard size, overlapping the
     merge compute of the following step under XLA's latency hiding).

After D steps every query has seen every photon exactly once, and the
estimator tail (`photon.gather.finish_estimate_payload`) runs locally —
identical math to the replicated paths, so the results match the
brute-force oracle exactly (no decimation).

Product wiring: `photon.trace.build_photon_maps(mesh=...)` uses
`estimate_irradiance_ring` for the irradiance-cache precompute
(photonmap.cpp:381-413) — the heaviest flat gather batch in the pipeline
(one query per stored photon) — keeping the photon set sharded until the
compact map ships to the renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import AXIS, shard_map
from ..ops import sampling as S
from ..photon.gather import finish_estimate_payload

# Photon-block width of the in-shard merge scan: the top-K merge
# temporaries are [query_chunk, K + _BLOCK] — bounded VMEM/HBM footprint
# regardless of shard size.
_BLOCK = 2048


def _pad_to(x, n, fill=0):
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def shard_photons(pos, power, dir_code, valid, mesh: Mesh):
    """Pad the photon arrays to a multiple of the mesh size and lay them out
    sharded over the ring axis.  Returns (pos, flux_f32, incident, valid)
    device arrays sharded P(AXIS) on the leading dim.

    The direction code is pre-decoded to unit vectors here: the ring carries
    payload (flux, incident) with each candidate, so queries never index the
    global photon array.
    """
    from jax.sharding import NamedSharding
    procs = {dev.process_index for dev in mesh.devices.flat}
    d = int(mesh.devices.size)
    n = pos.shape[0]
    n_pad = -(-max(n, 1) // (d * 8)) * (d * 8)
    incident = S.decode_direction(jnp.asarray(dir_code, jnp.int32))
    sh = NamedSharding(mesh, P(AXIS))
    arrs = (_pad_to(jnp.asarray(pos, jnp.float32), n_pad),
            _pad_to(jnp.asarray(power, jnp.float32), n_pad),
            _pad_to(incident, n_pad),
            _pad_to(jnp.asarray(valid, bool), n_pad))
    if len(procs) > 1:
        # P7 x P8: a device_put of host-local data onto a
        # non-fully-addressable sharding raises deep inside XLA.  Every
        # process holds the SAME full map (the trace is replicated across
        # processes — P5 keys make it bit-identical), so build the global
        # array per process from its own copy: the callback hands each
        # addressable shard its global row slice.
        import numpy as np

        def globalize(x):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: host[idx])

        return tuple(globalize(a) for a in arrs)
    return tuple(jax.device_put(a, sh) for a in arrs)


def build_sharded_maps(maps, cfg, mesh: Mesh):
    """Convert replicated PhotonMaps into the P8 deferred-gather layout:
    each map's photons laid out P(AXIS) over the mesh via shard_photons.
    The irradiance-cache global map stays replicated (`global_rep`) — its
    nearest-sample lookup has no deferred form; it is small by design
    (the cache exists to make tiny global maps cheap, README.md:464)."""
    from ..photon.gather import ShardedMaps

    def shard(grid):
        return shard_photons(grid.pos, grid.power.astype(jnp.float32),
                             grid.dir_code, grid.valid, mesh)

    ca = ga = gr = None
    if maps.caustic is not None:
        ca = shard(maps.caustic)
    if maps.global_ is not None:
        if cfg.irradiance_cache:
            gr = maps.global_
        else:
            ga = shard(maps.global_)
    return ShardedMaps(caustic=ca, global_=ga, caustic_rep=None,
                       global_rep=gr)


def _merge_shard(point, top_d2, top_flux, top_inc, shard, radius2):
    """Merge one resident photon shard into the running top-K payload.

    point [B,3]; top_d2 [B,K]; top_flux/top_inc [B,K,3];
    shard = (pos [Ns,3], flux [Ns,3], inc [Ns,3], valid [Ns]).
    """
    pos, flux, inc, valid = shard
    B, K = top_d2.shape
    Ns = pos.shape[0]
    pc = min(_BLOCK, Ns)
    pad = (-Ns) % pc
    n_blk = (Ns + pad) // pc
    blocks = (
        _pad_to(pos, Ns + pad).reshape(n_blk, pc, 3),
        _pad_to(flux, Ns + pad).reshape(n_blk, pc, 3),
        _pad_to(inc, Ns + pad).reshape(n_blk, pc, 3),
        _pad_to(valid, Ns + pad).reshape(n_blk, pc),
    )

    def body(carry, blk):
        td2, tfl, tin = carry
        bp, bf, bi, bv = blk
        d2 = jnp.sum((bp[None] - point[:, None]) ** 2, axis=-1)  # [B,pc]
        d2 = jnp.where(bv[None] & (d2 <= radius2), d2, jnp.inf)
        cat_d2 = jnp.concatenate([td2, d2], axis=1)
        neg, sel = jax.lax.top_k(-cat_d2, K)
        cat_fl = jnp.concatenate(
            [tfl, jnp.broadcast_to(bf[None], (B, pc, 3))], axis=1)
        cat_in = jnp.concatenate(
            [tin, jnp.broadcast_to(bi[None], (B, pc, 3))], axis=1)
        sel3 = sel[..., None]
        return (-neg,
                jnp.take_along_axis(cat_fl, sel3, axis=1),
                jnp.take_along_axis(cat_in, sel3, axis=1)), None

    (top_d2, top_flux, top_inc), _ = jax.lax.scan(
        body, (top_d2, top_flux, top_inc), blocks)
    return top_d2, top_flux, top_inc


def _ring_topk(point, shard, K, estimate_dist, n_dev):
    """Run the full ring: every device's queries see every photon shard.
    Returns the merged (top_d2, top_flux, top_inc) for the local queries."""
    B = point.shape[0]
    init = (jnp.full((B, K), jnp.inf),
            jnp.zeros((B, K, 3)), jnp.zeros((B, K, 3)))
    radius2 = estimate_dist * estimate_dist
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(d, carry):
        (td2, tfl, tin), sh = carry
        merged = _merge_shard(point, td2, tfl, tin, sh, radius2)
        sh = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, AXIS, perm), sh)
        return merged, sh

    # D-1 rotations + a final rotation-free merge: the last shard each
    # device sees stays put, so no ICI exchange is wasted on a result
    # nobody reads.
    (top, shard) = jax.lax.fori_loop(0, n_dev - 1, step, (init, shard))
    return _merge_shard(point, *top, shard, radius2)


def _chunked(point_like_args, chunk, fn):
    """Pad+reshape the leading query dim into chunks and lax.map `fn`."""
    B = point_like_args[0].shape[0]
    if B <= chunk:
        return fn(point_like_args)[:B]
    pad = (-B) % chunk
    args = tuple(
        _pad_to(a, B + pad).reshape((B + pad) // chunk, chunk, *a.shape[1:])
        for a in point_like_args)
    out = jax.lax.map(fn, args)
    return out.reshape(-1, *out.shape[2:])[:B]


def ring_radiance_queries(photons_shard, point, normal, exact_bounce,
                          cos_theta, kd, ks, shin, estimate_size,
                          estimate_dist, filter_type, cfg, n_dev: int,
                          query_chunk: int = 512):
    """EstimateRadiance over a sharded map, callable INSIDE an existing
    shard_map body (uniform collectives: every device must call this the
    same number of times with the same shapes).  `photons_shard` is this
    device's resident shard (pos, flux, incident, valid); `point` etc. are
    this device's local queries.  Used by estimate_radiance_ring below and
    by the sharded-map deferred-gather render (parallel/mesh.py)."""
    K = int(estimate_size)

    def one_chunk(xs):
        pt_, n_, eb_, ct_, kdc, ksc, shc = xs
        td2, tfl, tin = _ring_topk(pt_, photons_shard, K, estimate_dist,
                                   n_dev)
        return finish_estimate_payload(
            n_, eb_, ct_, kdc, ksc, shc, K, estimate_dist,
            filter_type, cfg, td2, tfl, tin)

    return _chunked((point, normal, exact_bounce, cos_theta, kd, ks, shin),
                    query_chunk, one_chunk)


def estimate_radiance_ring(photons, point, normal, exact_bounce, cos_theta,
                           kd, ks, shin, estimate_size, estimate_dist,
                           filter_type, cfg, mesh: Mesh,
                           query_chunk: int = 512):
    """EstimateRadiance (photon_utils.cpp:72-162) over a device-sharded
    photon map: queries AND photons sharded P(AXIS); D-1 ppermute rotations
    deliver every shard to every device.  Exact kNN (no decimation).

    `photons` is the (pos, flux, incident, valid) tuple from
    `shard_photons`.  Query arrays' leading dim must be divisible by the
    mesh size; returns radiance [B,3] sharded like the queries.
    """
    n_dev = int(mesh.devices.size)

    def body(pp, pt, n, eb, ct, kd_, ks_, sh_):
        return ring_radiance_queries(pp, pt, n, eb, ct, kd_, ks_, sh_,
                                     estimate_size, estimate_dist,
                                     filter_type, cfg, n_dev, query_chunk)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(AXIS),) + (P(AXIS),) * 7,
                  out_specs=P(AXIS), check_rep=False)
    return f(photons, point, normal, exact_bounce, cos_theta, kd, ks, shin)


def estimate_irradiance_ring(photons, point, estimate_size, estimate_dist,
                             mesh: Mesh, query_chunk: int = 512):
    """EstimateIrradiance (photon_utils.cpp:209-246) over a sharded map:
    plain flux/area disk estimate of the K nearest photons, via the same
    ring rotation.  Used by the irradiance-cache precompute when tracing
    ran on a mesh (one query per stored photon)."""
    n_dev = int(mesh.devices.size)
    K = int(estimate_size)
    cap2 = estimate_dist * estimate_dist

    def body(pp, pt):
        def one_chunk(xs):
            (pt_,) = xs
            td2, tfl, _ = _ring_topk(pt_, pp, K, estimate_dist, n_dev)
            found = jnp.isfinite(td2)
            num = jnp.sum(found, axis=1)
            max_d2 = jnp.where(
                num < K, jnp.asarray(cap2),
                jnp.maximum(jnp.max(jnp.where(found, td2, 0.0), axis=1),
                            1e-6))
            est = jnp.sum(jnp.where(found[..., None], tfl, 0.0), axis=1)
            est = est / (jnp.pi * max_d2)[:, None]
            return jnp.where((num > 0)[:, None], est, 0.0)
        return _chunked((pt,), query_chunk, one_chunk)

    f = shard_map(body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                  out_specs=P(AXIS), check_rep=False)
    return f(photons, point)
