"""Distributed connected components over a pair/edge Dataset.

The missing piece between near-dup PAIR detection (stages/dedup.py,
pipelines/queries.jaccard_pairs_dataset) and actionable dedup: pairs must
be grouped into duplicate CLUSTERS so a pipeline can keep one
representative per cluster.  Transitive closure is inherently iterative,
so this is the one operator family where a driver-side loop over Dataset
iterations is the honest design (each iteration is itself a distributed
cogroup; only the convergence scalar ever reaches the driver).

Algorithm: min-label propagation with pointer jumping.
  hop:   label(u) <- min(label(u), min_{(u,v) in E} label(v))
  jump:  label(u) <- label(label(u))
until the global label sum stops changing (labels only decrease, so an
unchanged sum IS convergence, checked with one tiny aggregate — no
old-vs-new join).  The jump composes the label map with itself, so label
paths halve each round: rounds = O(log diameter) instead of the plain
propagation's O(diameter) (same doubling idea as the large-star operation
in Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14).  Near-dup clusters are dense and shallow, so 2-3 rounds is
typical; max_iters guards pathological chains.

Scale shape per iteration (edges E, labels N, P shards):
  - edges ride ONE cogroup exchange keyed on dst%P to pick up label(dst),
    emitting (src, candidate_label) rows;
  - candidates union the current labels and take ONE groupby(src%P) min
    per shard (pandas-C, never one Ray group per node);
  - the jump is one more labels-only cogroup (label side keyed on
    label%P, lookup side on node%P) — O(N) rows, independent of E;
  - labels are repartition(P)-ed before each materialize().  This is
    load-bearing: groupby-sort emits one output block per input block and
    union concatenates block lists, so without the cap the label block
    count doubles per round (B' = S + 2B) and per-round cost grows
    EXPONENTIALLY (measured: 1.1s -> 2.8s -> 7.3s -> 22s -> 72s on a
    17-node toy graph).  Labels are the bounded iteration state, orders
    of magnitude smaller than the corpus, so the extra exchange is cheap.
Edges are NOT re-derived per round: symmetrized once and materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EMPTY_LABELS = pd.DataFrame(
    {"node": pd.Series(dtype="int64"), "label": pd.Series(dtype="int64")}
)


def connected_components(
    edges,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_shards: int = 16,
    max_iters: int = 25,
    driver_max_edges: int = 2_000_000,
):
    """(node int64, label int64) Dataset: label = min node id reachable.

    ``edges`` is a Dataset with two int64 id columns; only nodes that
    appear in at least one edge are labeled (an isolated doc is its own
    trivial cluster — callers that want those rows add them back with a
    cheap union, avoiding a full-corpus pass here).

    Size-gated driver fast path (same engineering as the broadcast-join
    gate, relational_ext): the edge set after near-dup verification is
    orders of magnitude smaller than the corpus, and each distributed
    round costs ~10 Ray sub-operations of fixed overhead.  When the
    symmetrized edge list is ``<= driver_max_edges`` (32 B/edge -> a
    ~64 MB driver array at the default 2M), solve it in one vectorized
    numpy pass instead of O(log d) distributed rounds; above the gate
    (boilerplate-heavy web text CAN produce billions of pairs) the
    distributed loop runs unchanged.  Both paths produce identical
    labels (tests/test_corpus_ext.py parity test).
    """
    from ray.data.aggregate import Sum

    P = num_shards

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, c])
        dst = np.concatenate([c, a])
        return pa.table(
            {
                "shard": pa.array(dst % P),
                "src": pa.array(src),
                "dst": pa.array(dst),
            }
        )

    # both propagation directions as (dst-sharded) rows, reused every round
    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    n_sym = sym.count()
    if n_sym == 0:  # no edges: empty typed labels (column-less otherwise)
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    if n_sym <= 2 * driver_max_edges:  # sym holds both directions
        import ray.data

        t = sym.select_columns(["src", "dst"]).to_pandas()
        nodes, labs = _driver_components(
            t["src"].to_numpy(), t["dst"].to_numpy()
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "label": pa.array(labs)})
        )

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(b.column("src").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "shard": pa.array(n % P),
                "node": pa.array(n),
                "label": pa.array(n),
            }
        )

    def min_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_LABELS
        return df.groupby("node", as_index=False)["label"].min()

    labels = (
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(min_in_shard, batch_format="pandas")
        .map_batches(_tag_nodes, fn_kwargs={"P": P}, batch_format="pandas")
        .repartition(P)
        .materialize()
    )

    def label_sum(ds) -> int:
        return int(ds.aggregate(Sum("label", alias_name="s"))["s"])

    def tag_edge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": b.column("shard"),
                "node": b.column("dst"),
                "other": b.column("src"),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                "label": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )

    def tag_label(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": b.column("shard"),
                "node": b.column("node"),
                "other": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                "label": b.column("label"),
            }
        )

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["side"] == 1]
        e = df[df["side"] == 0]
        if len(e) == 0:
            return _EMPTY_LABELS
        m = e.merge(
            lab[["node", "label"]], on="node", how="inner",
            suffixes=("", "_r"),
        )
        # candidate label for the EDGE SOURCE is the dst's label
        return pd.DataFrame(
            {"node": m["other"].to_numpy(), "label": m["label_r"].to_numpy()}
        )

    # pointer jump: resolve label(label(u)) with a labels-only cogroup.
    # side 0 = lookup requests keyed on the CURRENT label value;
    # side 1 = the label table keyed on node (every label value is some
    # node's id, so the lookup always hits).
    def tag_jump_req(b: pa.Table) -> pa.Table:
        lab = b.column("label")
        return pa.table(
            {
                "shard": pa.array(
                    lab.to_numpy(zero_copy_only=False) % P
                ),
                "key": lab,
                "node": b.column("node"),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                "label": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )

    def tag_jump_tab(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": b.column("shard"),
                "key": b.column("node"),
                "node": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                "label": b.column("label"),
            }
        )

    def jump_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        req = df[df["side"] == 0]
        if len(req) == 0:
            return _EMPTY_LABELS
        tab = df[df["side"] == 1]
        m = req.merge(
            tab[["key", "label"]], on="key", how="left", suffixes=("", "_r")
        )
        lab = m["label_r"].fillna(m["key"]).astype("int64")
        return pd.DataFrame({"node": m["node"].to_numpy(), "label": lab})

    prev = label_sum(labels)
    for _ in range(max_iters):
        # hop: one-hop neighbor labels onto each node, min-merged
        cands = (
            sym.map_batches(tag_edge, batch_format="pyarrow")
            .union(labels.map_batches(tag_label, batch_format="pyarrow"))
            .groupby("shard")
            .map_groups(propagate, batch_format="pandas")
        )
        hopped = (
            cands.map_batches(_tag_nodes, fn_kwargs={"P": P}, batch_format="pandas")
            .union(labels)
            .groupby("shard")
            .map_groups(min_in_shard, batch_format="pandas")
            .map_batches(_tag_nodes, fn_kwargs={"P": P}, batch_format="pandas")
            .repartition(P)
            .materialize()
        )
        # jump: label <- label(label), halving pointer paths
        new_labels = (
            hopped.map_batches(tag_jump_req, batch_format="pyarrow")
            .union(hopped.map_batches(tag_jump_tab, batch_format="pyarrow"))
            .groupby("shard")
            .map_groups(jump_in_shard, batch_format="pandas")
            .map_batches(_tag_nodes, fn_kwargs={"P": P}, batch_format="pandas")
            .repartition(P)
            .materialize()
        )
        cur = label_sum(new_labels)
        labels = new_labels
        if cur == prev:  # labels only decrease; equal sum == fixpoint
            break
        prev = cur
    return labels.map_batches(
        lambda b: b.drop_columns(["shard"]), batch_format="pyarrow"
    )


def _driver_components(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label propagation on the driver.

    ``(src, dst)`` must already contain both directions of every edge
    (the symmetrized list).  Same algorithm and convergence rule as the
    distributed loop: hop (min neighbor label via ``np.minimum.at``,
    synchronous-gather semantics — ``lab[d]`` is read before the
    in-place update), jump (``lab <- min(lab, lab[lab])``), stop when
    the label sum stops decreasing.  At the fixpoint ``lab[u] <=
    lab[v]`` across every directed edge, so labels are constant per
    component, and they include the component min, so they equal it.
    Returns (node ids, component-min label per node), both int64.
    """
    both = np.concatenate([src, dst])
    nodes, inv = np.unique(both, return_inverse=True)
    s = inv[: len(src)]
    d = inv[len(src):]
    lab = np.arange(len(nodes), dtype=np.int64)
    prev = int(lab.sum())
    for _ in range(64):
        np.minimum.at(lab, s, lab[d])  # hop (both directions present)
        lab = np.minimum(lab, lab[lab])  # pointer jump
        cur = int(lab.sum())
        if cur == prev:
            break
        prev = cur
    # safety: flatten any residual pointer chains (no-op at fixpoint)
    while True:
        nl = lab[lab]
        if np.array_equal(nl, lab):
            break
        lab = nl
    return nodes.astype(np.int64), nodes[lab].astype(np.int64)


_EMPTY_TAGGED = pa.table(
    {"shard": pa.array([], pa.int64()),
     "node": pa.array([], pa.int64()),
     "label": pa.array([], pa.int64())}
)


def _tag_nodes(df: pd.DataFrame, P: int) -> pa.Table:
    """Returns ARROW (not pandas): this is the last stage before every
    label shuffle, and Ray's pandas->arrow conversion at shuffle time
    reattaches the unhashable b'pandas' schema metadata (see
    tableutil.from_df)."""
    if len(df) == 0:
        return _EMPTY_TAGGED
    node = df["node"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "shard": pa.array(node % P),
            "node": pa.array(node),
            "label": pa.array(df["label"].to_numpy().astype(np.int64)),
        }
    )
