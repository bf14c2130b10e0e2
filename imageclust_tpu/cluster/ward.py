"""Size-constrained Ward agglomerative clustering, TPU-native.

Re-implements the observable semantics of the reference engine
(/root/reference/internal/clustering/clustering.go:198-284) as a vectorized,
static-shape JAX program:

* the n x n Ward distance matrix is one device array (the reference rebuilds
  Go slice-of-slices each merge, clustering.go:61-116),
* each merge iteration is a fused masked-argmin + rank-1 row/col update under
  ``lax.while_loop`` (the reference rescans the full matrix in nested Go
  loops, clustering.go:119-133 — O(n^2) per merge),
* clusters never move in memory: slots are deactivated by mask instead of Go
  slice surgery (clustering.go:51-58), and the reference's list ordering is
  reproduced exactly via per-cluster "birth" stamps (survivors keep relative
  order; merged clusters append at the end, clustering.go:240-241),
* the maxSize "poison the pair and rescan" rule (clustering.go:228-234) is
  equivalent to masking infeasible pairs out of the argmin, because cluster
  sizes never shrink — a pair that is ever oversized stays oversized,
* the under-min drop (clustering.go:268-271) and oversized-split
  (clustering.go:248-262, :295-349) passes are applied on the host from the
  merge log.

Tie-breaking parity: Go scans i in 0..n-1, j in 0..i-1 with strict '<'
(clustering.go:123-130), so the first minimal pair in list order wins. List
order equals birth order, so among equal distances we pick the pair with the
lexicographically smallest (birth_hi, birth_lo).

The merge loop records a merge log (birth_hi, birth_lo, new_birth); the host
reconstructs each final cluster's item list as indices(hi) ++ indices(lo) —
matching ``MergeClusters``'s append order where argument ``a`` is the
higher-index cluster (clustering.go:29-47 with the call at :237).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ClusterResult",
    "ConstraintError",
    "calculate_optimal_clusters",
    "constrained_ward",
    "pairwise_ward_singleton",
]

_BIG_I32 = np.int32(2**31 - 1)


class ConstraintError(ValueError):
    """Raised where the reference returns (nil, false) on impossible sizes
    (clustering.go:168-186)."""


def calculate_optimal_clusters(total_items: int, min_size: int, max_size: int) -> int:
    """Target cluster count heuristic — parity with clustering.go:168-186."""
    if total_items < min_size:
        raise ConstraintError(
            f"total items ({total_items}) less than minimum cluster size ({min_size})"
        )
    n_min = math.ceil(total_items / max_size)
    n_max = math.floor(total_items / min_size)
    if n_min > n_max:
        raise ConstraintError(
            f"cannot satisfy cluster size constraints with total items "
            f"({total_items}), minSize ({min_size}), and maxSize ({max_size})"
        )
    if n_min < n_max:
        return (n_min + n_max) // 2
    return n_min


class DefaultIds:
    """Lazy default item-id sequence: ``ids[k] == f"img_{k}"`` — the
    reference's id scheme (workflow.go:140) without materializing n Python
    strings up front. At the bucketed engine's 10M tier an eager list costs
    ~1 GB of host RAM and seconds of pure string formatting that columnar
    consumers (``ClusterResult.members``/``offsets`` readers) never need."""

    __slots__ = ("n",)

    def __init__(self, n: int):
        self.n = n

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, k):
        if isinstance(k, slice):
            return [f"img_{i}" for i in range(*k.indices(self.n))]
        k = int(k)
        if k < 0:
            k += self.n
        if not 0 <= k < self.n:
            raise IndexError(k)
        return f"img_{k}"

    def __iter__(self):
        return (f"img_{i}" for i in range(self.n))


class ClusterResult:
    """Outcome of a constrained-Ward run.

    ``cluster_map`` maps sequential cluster ids to item-id lists in the exact
    order the reference emits (clustering.go:264-280); ``dropped`` lists items
    whose cluster fell below ``min_size`` (the reference silently discards
    them, clustering.go:268-271); ``merges`` is the (hi, lo, new) birth-stamp
    dendrogram, a strict superset of what the reference exposes.

    Storage is either EAGER (``cluster_map`` dict — the exact/chain engines
    at interactive scale) or COLUMNAR (``members`` item-index array +
    ``offsets``, cluster c = ``members[offsets[c]:offsets[c+1]]`` — the
    bucketed engine's 10M tier, where materializing 2M+ python lists of id
    strings measured ~85 s of pure host time). ``cluster_map`` /
    ``dropped`` / ``_index_map`` are lazy views over the columnar form:
    callers that never touch the dict (bench, ``assignments()``,
    ``n_clusters``) never pay for it; callers that do see the identical
    contract.
    """

    def __init__(
        self,
        cluster_map: dict[int, list[str]] | None = None,
        dropped: list[str] | None = None,
        merges: np.ndarray | None = None,
        n_items: int = 0,
        n_clusters_target: int = 0,
        *,
        members: np.ndarray | None = None,   # concatenated item indices
        offsets: np.ndarray | None = None,   # (n_clusters + 1,)
        ids: "Sequence[str] | None" = None,
        dropped_idx: "np.ndarray | list[int] | None" = None,
    ):
        if cluster_map is None and (members is None or offsets is None
                                    or ids is None):
            raise ValueError(
                "ClusterResult needs cluster_map or (members, offsets, ids)")
        self._cluster_map = cluster_map
        self._dropped = dropped
        self.merges = merges if merges is not None else np.zeros(
            (0, 3), np.int32)
        self.n_items = n_items
        self.n_clusters_target = n_clusters_target
        self._members = members
        self._offsets = offsets
        self._ids = ids
        self._dropped_idx = dropped_idx
        self._index_map_cache: dict[int, list[int]] | None = None

    @property
    def n_clusters(self) -> int:
        """Cluster count WITHOUT materializing the dict."""
        if self._cluster_map is not None:
            return len(self._cluster_map)
        return len(self._offsets) - 1

    @property
    def cluster_map(self) -> dict[int, list[str]]:
        if self._cluster_map is None:
            ids, mem, off = self._ids, self._members, self._offsets
            self._cluster_map = {
                c: [ids[k] for k in mem[off[c]:off[c + 1]]]
                for c in range(len(off) - 1)
            }
        return self._cluster_map

    @property
    def dropped(self) -> list[str]:
        if self._dropped is None:
            self._dropped = [self._ids[k] for k in
                             (self._dropped_idx
                              if self._dropped_idx is not None else ())]
        return self._dropped

    @property
    def _index_map(self) -> dict[int, list[int]]:
        """cluster id -> item indices (set eagerly by the engines or
        materialized lazily from the columnar form)."""
        if self._index_map_cache is None:
            if self._members is None:
                raise AttributeError("_index_map was never populated")
            off = self._offsets
            self._index_map_cache = {
                c: self._members[off[c]:off[c + 1]].tolist()
                for c in range(len(off) - 1)
            }
        return self._index_map_cache

    @_index_map.setter
    def _index_map(self, value: dict[int, list[int]]) -> None:
        self._index_map_cache = value

    def assignments(self) -> np.ndarray:
        """Per-item cluster id (-1 for dropped items), by item position."""
        out = np.full(self.n_items, -1, dtype=np.int64)
        if self._members is not None:
            sizes = np.diff(self._offsets)
            out[self._members] = np.repeat(
                np.arange(len(sizes), dtype=np.int64), sizes)
        else:
            for cid, members in self._index_map.items():
                out[members] = cid
        return out


class _LoopState(NamedTuple):
    D: jax.Array  # (n, n) f32 Ward distances between slots
    sizes: jax.Array  # (n,) i32
    births: jax.Array  # (n,) i32 — Go list order == sorted birth order
    cents: jax.Array  # (n, d) f32
    active: jax.Array  # (n,) bool
    counter: jax.Array  # i32 next birth stamp
    num_active: jax.Array  # i32
    log: jax.Array  # (n-1, 3) i32 merge log
    step: jax.Array  # i32 merges performed
    found: jax.Array  # bool — False once no feasible pair remains


def pairwise_ward_singleton(x: jax.Array) -> jax.Array:
    """Initial Ward distances between singletons: 0.5 * ||xi - xj||^2.

    Matches WardDistance for size-1 clusters (clustering.go:136-145 with
    |a|=|b|=1). Uses a Gram matmul (MXU) at HIGHEST precision — the distance
    scale decides merges, so f32 accuracy is kept.
    """
    sq = jnp.sum(x * x, axis=1)
    gram = jax.lax.dot_general(
        x,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return 0.5 * jnp.maximum(d2, 0.0)


def ward_update_vector(
    update_rule: str,
    *,
    sizes_f: jax.Array,  # (m,) f32 — sizes of the slots being updated
    s_a_f: jax.Array,
    s_b_f: jax.Array,
    s_new_f: jax.Array,
    d_a: jax.Array | None = None,   # (m,) D[sa, ·] over those slots
    d_b: jax.Array | None = None,   # (m,) D[sb, ·]
    d_ab: jax.Array | None = None,  # scalar D[sa, sb]
    cents: jax.Array | None = None,  # (m, d) centroids of those slots
    c_new: jax.Array | None = None,  # (d,) merged centroid
) -> jax.Array:
    """The merged cluster's new distance row — the parity-critical Ward
    recurrence, kept as ONE source of truth for the unfused body, the fused
    Pallas loop, and the shard_map exact loop (CLAUDE.md's bit-parity
    invariant requires all three to round identically).

    "centroid" recomputes from centroids exactly as the reference does after
    every merge (clustering.go:83-87); "lance_williams" is the O(1)-per-
    entry recurrence, identical in exact arithmetic."""
    if update_rule == "centroid":
        diff = cents - c_new[None, :]
        sq = jnp.sum(diff * diff, axis=1)
        return (s_new_f * sizes_f / (s_new_f + sizes_f)) * sq
    if update_rule == "lance_williams":
        return ((s_a_f + sizes_f) * d_a + (s_b_f + sizes_f) * d_b
                - sizes_f * d_ab) / (s_new_f + sizes_f)
    raise ValueError(f"unknown update_rule: {update_rule}")


def _merge_body(
    state: _LoopState,
    *,
    max_size: jax.Array,
    update_rule: str,
    absorb_min: jax.Array | None = None,
) -> _LoopState:
    """One gated merge step: if no feasible pair remains the body is a
    no-op and the loop exits via ``found``. ``absorb_min`` switches the
    feasibility mask to the absorb phase: only pairs involving a below-min
    cluster merge."""
    f32 = jnp.float32
    b = state.births

    # Feasible-pair argmin with the Go tie-break: lexicographically smallest
    # (birth_hi, birth_lo) among minima == first pair in Go scan order
    # (clustering.go:123-130). The single-device TPU exact loop uses the
    # fused Pallas step (_merge_loop_fused_impl) instead of this body.
    from imageclust_tpu.ops.pallas_kernels import masked_argmin_pair_xla

    dmin, m1, m2 = masked_argmin_pair_xla(
        state.D, b, state.sizes, state.active, max_size,
        require_under=absorb_min,
    )
    proceed = found = jnp.isfinite(dmin)

    sa = jnp.argmax(b == m1)  # slot of Go's clusters[i] (later in list)
    sb = jnp.argmax(b == m2)  # slot of Go's clusters[j]

    s_a = state.sizes[sa]
    s_b = state.sizes[sb]
    s_new = s_a + s_b
    c_new = (
        s_a.astype(f32) * state.cents[sa] + s_b.astype(f32) * state.cents[sb]
    ) / s_new.astype(f32)

    sizes_f = state.sizes.astype(f32)
    s_new_f = s_new.astype(f32)
    dvec = ward_update_vector(
        update_rule, sizes_f=sizes_f, s_a_f=s_a.astype(f32),
        s_b_f=s_b.astype(f32), s_new_f=s_new_f,
        d_a=state.D[sa], d_b=state.D[sb], d_ab=state.D[sa, sb],
        cents=state.cents, c_new=c_new,
    )
    dvec = dvec.at[sa].set(0.0)

    new_birth = state.counter
    D = state.D.at[sa, :].set(dvec).at[:, sa].set(dvec)
    sizes = state.sizes.at[sa].set(s_new).at[sb].set(0)
    births = b.at[sa].set(new_birth)
    cents = state.cents.at[sa].set(c_new)
    active = state.active.at[sb].set(False)
    log = state.log.at[state.step].set(jnp.stack([m1, m2, new_birth]))

    # Gate every update on `proceed`: if no feasible pair remained (or the
    # outer halt fired), this body is a no-op; the loop exits via `found`.
    gate = lambda new, old: jnp.where(proceed, new, old)
    return _LoopState(
        D=gate(D, state.D),
        sizes=gate(sizes, state.sizes),
        births=gate(births, state.births),
        cents=gate(cents, state.cents),
        active=gate(active, state.active),
        counter=gate(state.counter + 1, state.counter),
        num_active=gate(state.num_active - 1, state.num_active),
        log=gate(log, state.log),
        step=gate(state.step + 1, state.step),
        found=found,
    )


def _merge_loop_impl(
    x: jax.Array,  # (n_pad, d) f32, rows >= n_items are padding
    n_items: jax.Array,  # i32
    n_target: jax.Array,  # i32
    max_size: jax.Array,  # i32
    update_rule: str = "centroid",
):
    """Run the full constrained merge loop on device; returns the merge log.
    Single-device path; the multi-chip exact mode is the explicit shard_map
    program in :func:`_sharded_merge_loop`."""
    n_pad, _ = x.shape
    f32 = jnp.float32
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    active0 = idx < n_items

    D0 = pairwise_ward_singleton(x.astype(f32))
    state = _LoopState(
        D=D0,
        sizes=jnp.where(active0, 1, 0).astype(jnp.int32),
        # padding slots get huge births so they can never win a tie (they are
        # also masked out via `active`).
        births=jnp.where(active0, idx, _BIG_I32 - n_pad + idx),
        cents=x.astype(f32),
        active=active0,
        counter=n_items.astype(jnp.int32),
        num_active=n_items.astype(jnp.int32),
        log=jnp.zeros((max(n_pad - 1, 1), 3), jnp.int32),
        step=jnp.int32(0),
        found=jnp.bool_(True),
    )

    body = partial(_merge_body, max_size=max_size, update_rule=update_rule)
    state = jax.lax.while_loop(
        lambda st: st.found & (st.num_active > n_target),
        body,
        state,
    )
    return state.log, state.step, state.births, state.sizes, state.active


def _merge_loop_fused_impl(
    x: jax.Array,  # (n_pad, d) f32, rows >= n_items are padding
    n_items: jax.Array,
    n_target: jax.Array,
    max_size: jax.Array,
    update_rule: str = "centroid",
    interpret: bool = False,
):
    """The single-device exact loop built on the fused Pallas merge step
    (ops.pallas_kernels.merge_update_argmin): each iteration streams the
    n x n matrix ONCE, applying the previous merge's row/column update in
    place and reducing the next feasible-pair argmin in the same pass. The
    unfused body reads the matrix several times per merge (masks, E, tie
    planes) plus a separate scatter update.

    The update is PENDING-style: iteration k's kernel call applies merge
    k-1's row update before reducing; small state (sizes/births/active/log)
    updates eagerly, so the argmin masks are always post-merge. The final
    merge's matrix update is never applied — only the log leaves the loop.
    Semantics (tie-breaks included) identical to _merge_loop_impl.
    """
    from imageclust_tpu.ops.pallas_kernels import merge_update_argmin

    n_pad, _ = x.shape
    f32 = jnp.float32
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    active0 = idx < n_items

    D0 = pairwise_ward_singleton(x.astype(f32))
    carry0 = (
        D0,
        jnp.where(active0, 1, 0).astype(jnp.int32),            # sizes
        jnp.where(active0, idx, _BIG_I32 - n_pad + idx),       # births
        x.astype(f32),                                         # cents
        active0,                                               # active
        n_items.astype(jnp.int32),                             # counter
        n_items.astype(jnp.int32),                             # num_active
        jnp.zeros((max(n_pad - 1, 1), 3), jnp.int32),          # log
        jnp.int32(0),                                          # step
        jnp.bool_(True),                                       # found
        jnp.int32(0),                                          # pending sa
        jnp.zeros((n_pad,), f32),                              # pending dvec
        jnp.int32(0),                                          # do_update
    )

    def body(carry):
        (D, sizes, births, cents, active, counter, num_active, log, step,
         _found, p_sa, p_dvec, p_do) = carry
        D, dmin, m1, m2 = merge_update_argmin(
            D, p_dvec, p_sa, p_do, births, sizes, active, max_size,
            interpret=interpret,
        )
        found = jnp.isfinite(dmin)

        sa = jnp.argmax(births == m1).astype(jnp.int32)
        sb = jnp.argmax(births == m2).astype(jnp.int32)
        s_a = sizes[sa]
        s_b = sizes[sb]
        s_new = s_a + s_b
        sizes_f = sizes.astype(f32)
        s_new_f = s_new.astype(f32)
        c_new = (s_a.astype(f32) * cents[sa]
                 + s_b.astype(f32) * cents[sb]) / s_new_f

        dvec = ward_update_vector(
            update_rule, sizes_f=sizes_f, s_a_f=s_a.astype(f32),
            s_b_f=s_b.astype(f32), s_new_f=s_new_f,
            d_a=D[sa], d_b=D[sb], d_ab=D[sa, sb],
            cents=cents, c_new=c_new,
        )
        dvec = dvec.at[sa].set(0.0)

        new_birth = counter
        gate = lambda new, old: jnp.where(found, new, old)  # noqa: E731
        return (
            D,
            gate(sizes.at[sa].set(s_new).at[sb].set(0), sizes),
            gate(births.at[sa].set(new_birth), births),
            gate(cents.at[sa].set(c_new), cents),
            gate(active.at[sb].set(False), active),
            gate(counter + 1, counter),
            gate(num_active - 1, num_active),
            gate(log.at[step].set(jnp.stack([m1, m2, new_birth])), log),
            gate(step + 1, step),
            found,
            gate(sa, jnp.int32(0)),
            gate(dvec, jnp.zeros_like(dvec)),
            jnp.where(found, 1, 0).astype(jnp.int32),
        )

    def cond(carry):
        return carry[9] & (carry[6] > n_target)

    out = jax.lax.while_loop(cond, body, carry0)
    return out[7], out[8], out[2], out[1], out[4]


_merge_loop = partial(jax.jit, static_argnames=("update_rule",))(
    _merge_loop_impl
)

_merge_loop_fused = partial(
    jax.jit, static_argnames=("update_rule", "interpret")
)(_merge_loop_fused_impl)


# Measured VMEM wall for merge_update_argmin (one v5 lite chip): n_pad=4096
# compiles and runs; n_pad=8192 fails AOT with "scoped allocation 28.08M
# ... limit 16.00M" (the kernel's per-stripe scratch scales with n). The
# scaling is linear, so the largest safe padded n is ~4.6k; gate at the
# measured-good 4096 and fall back to the unfused XLA body above it
# (bit-identical by the pinned tests; just slower per merge).
_FUSED_MERGE_MAX_N = 4096


def _use_fused_loop(n_pad: int = 0) -> bool:
    """Whether to run the fused Pallas merge loop. ``n_pad`` is the padded
    problem size (0 = caller guarantees a small matrix, e.g. the bucketed
    engine's per-bucket blocks); IMAGECLUST_FUSED_MERGE=0/1 overrides both
    the backend default and the VMEM bound."""
    import os

    flag = os.environ.get("IMAGECLUST_FUSED_MERGE", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu" and n_pad <= _FUSED_MERGE_MAX_N

_SHARDED_LOOPS: dict = {}


def _sharded_merge_loop(mesh, update_rule: str):
    """Per-mesh jitted exact merge loop, D row-sharded over 'data' via
    shard_map.

    Round-1 shipped this as a ``with_sharding_constraint`` on D0 and hoped
    XLA would keep the sharding through the ``while_loop`` — HLO inspection
    showed it instead ALL-GATHERED the full n x n matrix every merge. This
    version writes the distribution explicitly (SURVEY.md §5 "sequence
    parallel" analog):

    * each device owns a (n/D, n) row block of the Ward matrix; the initial
      block is computed locally (one (n/D, d) x (d, n) MXU matmul),
    * the feasible-pair argmin reduces locally per block, then globally with
      three scalar ``pmin``s (min distance, then the Go tie-break pair),
    * the Lance-Williams / centroid row update is LOCAL thanks to symmetry:
      D[sa, j] = D[j, sa] lives in the j-owner's block as a column read;
      each device rewrites its column sa, and the one device owning row sa
      rewrites it from a single (n,) all_gather of the new values —
      per-merge communication is O(n) bytes + 3 scalars, never O(n^2).

    Small replicated state (sizes, births, active, merge log) is updated
    identically on every device. Exact same semantics (tie-breaks included)
    as the single-device loop; enables exact-mode n where one chip's HBM
    cannot hold the n^2 matrix (n=100k needs 40 GB; 5 GB/chip on v5e-8).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    key = (mesh, update_rule)  # Mesh is hashable; id() could alias after GC
    if key in _SHARDED_LOOPS:
        return _SHARDED_LOOPS[key]

    ndev = mesh.shape["data"]
    f32 = jnp.float32

    def local_body(x_full, n_items, n_target, max_size):
        # Runs per device under shard_map: x_full replicated (n_pad, d).
        n_pad = x_full.shape[0]
        rows_per = n_pad // ndev
        my = jax.lax.axis_index("data")
        row0 = my * rows_per
        my_gids = row0 + jnp.arange(rows_per, dtype=jnp.int32)

        # local row block of the singleton Ward matrix (one MXU matmul)
        xs = jax.lax.dynamic_slice_in_dim(x_full, row0, rows_per, 0)
        sq_r = jnp.sum(xs * xs, axis=1)
        sq_c = jnp.sum(x_full * x_full, axis=1)
        gram = jax.lax.dot_general(
            xs, x_full, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
        Dl = 0.5 * jnp.maximum(sq_r[:, None] + sq_c[None, :] - 2.0 * gram, 0.0)

        idx = jnp.arange(n_pad, dtype=jnp.int32)
        active0 = idx < n_items
        births0 = jnp.where(active0, idx, _BIG_I32 - n_pad + idx)
        sizes0 = jnp.where(active0, 1, 0).astype(jnp.int32)
        log0 = jnp.zeros((max(n_pad - 1, 1), 3), jnp.int32)

        def body(carry):
            (Dl, sizes, births, cents, active, counter, num_active, log,
             step, _found) = carry
            act_r = active[my_gids]
            act_c = active
            sizes_r = sizes[my_gids]
            ok = (act_r[:, None] & act_c[None, :]
                  & (my_gids[:, None] != idx[None, :]))
            ok &= (sizes_r[:, None] + sizes[None, :]) <= max_size
            E = jnp.where(ok, Dl, jnp.inf)
            gdmin = jax.lax.pmin(jnp.min(E), "data")
            tie = ok & (E == gdmin)
            b_r = births[my_gids]
            bhi = jnp.maximum(b_r[:, None], births[None, :])
            blo = jnp.minimum(b_r[:, None], births[None, :])
            m1 = jax.lax.pmin(jnp.min(jnp.where(tie, bhi, _BIG_I32)), "data")
            m2 = jax.lax.pmin(
                jnp.min(jnp.where(tie & (bhi == m1), blo, _BIG_I32)), "data")
            found = jnp.isfinite(gdmin)

            sa = jnp.argmax(births == m1).astype(jnp.int32)
            sb = jnp.argmax(births == m2).astype(jnp.int32)
            s_a = sizes[sa]
            s_b = sizes[sb]
            s_new = s_a + s_b
            sizes_f = sizes.astype(f32)
            s_new_f = s_new.astype(f32)
            c_new = (s_a.astype(f32) * cents[sa]
                     + s_b.astype(f32) * cents[sb]) / s_new_f

            if update_rule == "centroid":
                # my slice of the new row, from replicated centroids
                dvec_l = ward_update_vector(
                    update_rule, sizes_f=sizes_f[my_gids],
                    s_a_f=s_a.astype(f32), s_b_f=s_b.astype(f32),
                    s_new_f=s_new_f, cents=cents[my_gids], c_new=c_new,
                )
            else:  # lance_williams — all reads local by symmetry
                d_ab = jax.lax.psum(
                    jnp.sum(jnp.where(my_gids == sa, Dl[:, sb], 0.0)), "data")
                dvec_l = ward_update_vector(
                    update_rule, sizes_f=sizes_f[my_gids],
                    s_a_f=s_a.astype(f32), s_b_f=s_b.astype(f32),
                    s_new_f=s_new_f, d_a=Dl[:, sa], d_b=Dl[:, sb], d_ab=d_ab,
                )
            dvec_l = jnp.where(my_gids == sa, 0.0, dvec_l)

            # column write (local) + row write (owner, from one (n,) gather)
            dvec_full = jax.lax.all_gather(dvec_l, "data").reshape(n_pad)
            Dl_new = Dl.at[:, sa].set(dvec_l)
            Dl_new = jnp.where((my_gids == sa)[:, None],
                               dvec_full[None, :], Dl_new)

            new_birth = counter
            sizes_n = sizes.at[sa].set(s_new).at[sb].set(0)
            births_n = births.at[sa].set(new_birth)
            cents_n = cents.at[sa].set(c_new)
            active_n = active.at[sb].set(False)
            log_n = log.at[step].set(jnp.stack([m1, m2, new_birth]))

            gate = lambda new, old: jnp.where(found, new, old)
            return (
                gate(Dl_new, Dl),
                gate(sizes_n, sizes),
                gate(births_n, births),
                gate(cents_n, cents),
                gate(active_n, active),
                gate(counter + 1, counter),
                gate(num_active - 1, num_active),
                gate(log_n, log),
                gate(step + 1, step),
                found,
            )

        def cond(carry):
            return carry[9] & (carry[6] > n_target)

        init = (Dl, sizes0, births0, x_full.astype(f32), active0,
                n_items.astype(jnp.int32), n_items.astype(jnp.int32),
                log0, jnp.int32(0), jnp.bool_(True))
        out = jax.lax.while_loop(cond, body, init)
        return out[7], out[8], out[2], out[1], out[4]

    P_rep = P()
    fn = shard_map(
        local_body, mesh=mesh,
        in_specs=(P_rep, P_rep, P_rep, P_rep),
        out_specs=(P_rep, P_rep, P_rep, P_rep, P_rep),
        check_vma=False,
    )
    _SHARDED_LOOPS[key] = jax.jit(fn)
    return _SHARDED_LOOPS[key]


def _pad_len(n: int) -> int:
    """Round up to a lane-aligned padded size to bound recompilations."""
    return max(128, int(128 * math.ceil(n / 128)))


def _leaf_indices(birth: int, n_items: int, children: dict[int, tuple[int, int]]) -> list[int]:
    """Expand a cluster birth stamp into its item indices in Go append order:
    indices(hi-child) then indices(lo-child) (clustering.go:29-47)."""
    out: list[int] = []
    stack = [birth]
    while stack:
        node = stack.pop()
        if node < n_items:
            out.append(node)
        else:
            hi, lo = children[node]
            stack.append(lo)
            stack.append(hi)
    return out


def _run_merges(
    x: np.ndarray, n_target: int, max_size: int, update_rule: str,
    mesh=None,
) -> tuple[list[list[int]], np.ndarray]:
    """Run the device loop; return surviving clusters' index lists in Go list
    order (birth order) plus the merge log."""
    n = x.shape[0]
    n_pad = _pad_len(n)
    if mesh is not None:
        ndev = mesh.shape["data"]
        n_pad = int(math.ceil(n_pad / (128 * ndev))) * 128 * ndev
    xp = np.zeros((n_pad, x.shape[1]), np.float32)
    xp[:n] = x
    if mesh is not None:
        loop = _sharded_merge_loop(mesh, update_rule)
        log, steps, births, sizes, active = loop(
            jnp.asarray(xp), jnp.int32(n), jnp.int32(n_target),
            jnp.int32(max_size),
        )
    elif _use_fused_loop(n_pad):
        log, steps, births, sizes, active = _merge_loop_fused(
            jnp.asarray(xp),
            jnp.int32(n),
            jnp.int32(n_target),
            jnp.int32(max_size),
            update_rule=update_rule,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        log, steps, births, sizes, active = _merge_loop(
            jnp.asarray(xp),
            jnp.int32(n),
            jnp.int32(n_target),
            jnp.int32(max_size),
            update_rule=update_rule,
        )
    log = np.asarray(log)[: int(steps)]
    births = np.asarray(births)
    active = np.asarray(active)

    children = {int(new): (int(hi), int(lo)) for hi, lo, new in log}
    surviving = sorted(int(b) for b in births[active])
    clusters = [_leaf_indices(b, n, children) for b in surviving]
    return clusters, log


def split_oversized(
    x: np.ndarray,
    members: list[int],
    max_size: int,
    update_rule: str = "centroid",
) -> list[list[int]]:
    """Split one oversized cluster by re-running the merge engine on its
    members with the minSize=1 target — splitCluster semantics
    (clustering.go:295-349, sub-target heuristic at :303)."""
    sub_target = calculate_optimal_clusters(len(members), 1, max_size)
    sub_clusters, _ = _run_merges(
        np.asarray(x, np.float32)[members], sub_target, max_size, update_rule
    )
    return [[members[k] for k in sub] for sub in sub_clusters]


def reassign_dropped_members(
    x: np.ndarray,
    index_map: dict[int, list[int]],
    dropped_idx: list[int],
    max_size: int,
) -> tuple[dict[int, list[int]], list[int]]:
    """Optional post-pass: attach each dropped item to the nearest surviving
    cluster (by centroid) that still has room. The reference silently
    discards under-min clusters (clustering.go:268-271) — losing user images;
    this recovers them without violating max_size. Returns the updated
    index map and the items that still could not be placed."""
    if not dropped_idx or not index_map:
        return index_map, list(dropped_idx)
    cids = sorted(index_map)
    centroids = np.stack([x[index_map[c]].mean(axis=0) for c in cids])
    still_dropped: list[int] = []
    for item in dropped_idx:
        d2 = ((centroids - x[item]) ** 2).sum(axis=1)
        placed = False
        for ci in np.argsort(d2):
            cid = cids[ci]
            if len(index_map[cid]) < max_size:
                index_map[cid].append(item)
                # keep the centroid current so subsequent placements see it
                centroids[ci] = x[index_map[cid]].mean(axis=0)
                placed = True
                break
        if not placed:
            still_dropped.append(item)
    return index_map, still_dropped


def constrained_ward(
    embeddings: np.ndarray | jax.Array,
    ids: Sequence[str] | None = None,
    *,
    min_size: int = 3,
    max_size: int = 6,
    update_rule: str = "centroid",
    reassign_dropped: bool = False,
    mesh=None,
) -> ClusterResult:
    """Cluster ``embeddings`` under [min_size, max_size] Ward semantics.

    Drop-in behavioral equivalent of ``PerformClusteringWithConstraints``
    (clustering.go:198-284). Raises :class:`ConstraintError` where the
    reference returns (nil, false). ``reassign_dropped=True`` replaces the
    reference's silent image loss with nearest-cluster reassignment. With
    ``mesh``, the distance matrix row-shards over the mesh's 'data' axis and
    the per-merge argmin reduces via XLA collectives.
    """
    x = np.asarray(embeddings, dtype=np.float32)
    if x.ndim != 2:
        raise ValueError(f"embeddings must be (n, d), got {x.shape}")
    n = x.shape[0]
    if ids is None:
        ids = [f"img_{i}" for i in range(n)]  # workflow.go:140 id scheme
    if len(ids) != n:
        raise ValueError("ids length must match embeddings")

    n_target = calculate_optimal_clusters(n, min_size, max_size)
    clusters, log = _run_merges(x, n_target, max_size, update_rule, mesh=mesh)

    # Oversized-split pass (clustering.go:248-262). Unreachable through the
    # public path (the merge loop never exceeds max_size) but preserved.
    final: list[list[int]] = []
    for members in clusters:
        if len(members) > max_size:
            final.extend(split_oversized(x, members, max_size, update_rule))
        else:
            final.append(members)

    index_map: dict[int, list[int]] = {}
    dropped_idx: list[int] = []
    cid = 0
    for members in final:
        if len(members) < min_size:  # clustering.go:268-271
            dropped_idx.extend(members)
            continue
        index_map[cid] = members
        cid += 1

    if reassign_dropped:
        index_map, dropped_idx = reassign_dropped_members(
            x, index_map, dropped_idx, max_size
        )

    cluster_map = {c: [ids[k] for k in mem] for c, mem in index_map.items()}
    result = ClusterResult(
        cluster_map=cluster_map,
        dropped=[ids[k] for k in dropped_idx],
        merges=log,
        n_items=n,
        n_clusters_target=n_target,
    )
    result._index_map = index_map
    return result
