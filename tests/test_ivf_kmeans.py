"""k-means IVF plug-in path (VERDICT r2 #5).

The sf fixture embeddings are near-isotropic, so recall there tracks the
probed-corpus fraction for ANY quantizer (see similarity.ann_ivf_topk
docstring for the measured curve). These tests prove the trainer and the
centroid plug-in seam on data WITH structure: 10 well-separated clusters,
where trained centroids reach full recall probing 2/16 cells while
first-n centroids cannot.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import similarity as sim

N_CLUSTERS = 10
PER_CLUSTER = 100
DIM = 32


def _clustered(seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(N_CLUSTERS, DIM) * 4
    rows = []
    for c in range(N_CLUSTERS):
        pts = centers[c] + rng.randn(PER_CLUSTER, DIM) * 0.3
        rows.append(pts)
    return np.vstack(rows)  # vec_id = row index; cluster = id // PER_CLUSTER


@pytest.fixture(scope="module")
def data(spark):
    x = _clustered()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    return x, df


def test_trainer_is_deterministic():
    x = _clustered()
    a = sim.train_kmeans_centroids(x, k=16, seed=0)
    b = sim.train_kmeans_centroids(x, k=16, seed=0)
    assert np.array_equal(a, b)
    assert a.shape == (16, DIM)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_trainer_recovers_cluster_structure():
    x = _clustered()
    cents = sim.train_kmeans_centroids(x, k=16, seed=0)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assign = np.argmax(xn @ cents.T, axis=1)
    # every true cluster maps to cells not shared with other clusters:
    # purity of the induced partition must be ~1 on separated clusters
    purity = 0
    for cell in np.unique(assign):
        members = assign == cell
        true = np.arange(len(x))[members] // PER_CLUSTER
        purity += np.bincount(true).max()
    assert purity / len(x) >= 0.99


def test_kmeans_ivf_high_recall_at_low_nprobe_on_clustered_data(spark, data):
    x, df = data
    probes = df.filter(F.col("vec_id") % 97 == 0)  # ~11 spread probes
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(df, probes, k=5).collect()
    }
    cents = sim.train_kmeans_centroids(x, k=16, seed=0)
    trained = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_ivf_topk(
            df, probes, k=5, nprobe=2, centroids=sim.centroids_df(spark, cents)
        ).collect()
    }
    r_trained = len(exact & trained) / len(exact)
    assert r_trained >= 0.9, f"trained recall {r_trained}"


def test_kmeans_cells_bound_probe_cost(spark, data):
    """On clustered data, recall can tie between quantizers (tight
    clusters co-assign under ANY deterministic argmax) — the trained
    quantizer's real win is BALANCED cells, which is what bounds the
    per-probe scan cost at 100 TB. First-n centroids (all 16 drawn from
    true cluster 0 here) produce lopsided cells."""
    x, df = data
    cents = sim.train_kmeans_centroids(x, k=16, seed=0)
    trained_sizes = (
        sim.ivf_cells(df, sim.centroids_df(spark, cents), nprobe=1)
        .groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    firstn_sizes = (
        sim.ivf_cells(df, df.filter(F.col("vec_id") < 16), nprobe=1)
        .groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    n = len(x)
    # trained: biggest cell ~ one true cluster (n/10); first-n: the
    # 9 clusters without a centroid pile into whichever cells win
    assert trained_sizes <= n // 8, f"trained max cell {trained_sizes}"
    assert firstn_sizes > trained_sizes, (firstn_sizes, trained_sizes)


def test_centroid_plug_in_matches_default_when_fed_first_n(spark, data):
    """Feeding the default centroids through the plug-in seam must
    reproduce the default path row-for-row."""
    x, df = data
    probes = df.filter(F.col("vec_id") < 5)
    default = sim.ann_ivf_topk(df, probes, k=5, n_centroids=16, nprobe=2).collect()
    fed = sim.ann_ivf_topk(
        df, probes, k=5, nprobe=2, centroids=sim.centroids_df(spark, x[:16])
    ).collect()
    assert [tuple(r) for r in default] == [tuple(r) for r in fed]
