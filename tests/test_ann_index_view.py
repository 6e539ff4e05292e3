"""Continuous ANN index maintenance (AnnIndexView): the assignments
table must always equal assigning the CURRENT corpus with the pinned
quantizer — across append (extend), upsert/delete (key-addressed
recompute), growth-triggered retrain, and erasure — while the extend
path touches only the delta."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from feasts_spark.operators.ann_index import AnnIndexView
from feasts_spark.operators.similarity import _ivf_assign, ivf_query_topk
from feasts_spark.sources.snapshots import SnapshotTable


def _vecs(spark, ids, dim=8, bump=0.0):
    rows = [
        Row(vec_id=int(i),
            # the small i-dependent ramp keeps every vector's DIRECTION
            # unique (otherwise ids 13 apart are identical mod 13 and
            # top-1 ties away from self)
            embedding=[float(((i * 31 + d * 7) % 13) - 6 + bump
                             + i * 0.001 * (d + 1))
                       for d in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def view(spark, tmp_path):
    src = SnapshotTable(spark, str(tmp_path), "emb",
                        stats_cols=("vec_id",), bloom_cols=("vec_id",))
    tgt = SnapshotTable(spark, str(tmp_path), "ann_ivf",
                        stats_cols=("cell",), bloom_cols=("id",))
    cen = SnapshotTable(spark, str(tmp_path), "ann_ivf_centroids",
                        stats_cols=())
    return src, AnnIndexView(src, tgt, cen, n_cells=4, retrain_growth=0.5)


def _assert_index_matches(src, v):
    """(id, cell) of the maintained index == assigning the whole current
    corpus with the pinned quantizer."""
    got = {(r["id"], r["cell"]) for r in v.target.read()
           .select("id", "cell").collect()}
    expect = {(r["id"], r["cell"]) for r in _ivf_assign(
        src.read(), v._cent_np(), "vec_id", "embedding", nprobe=1)
        .select("id", "cell").collect()}
    assert got == expect


class TestAnnIndexView:
    def test_full_then_extend(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(40)))
        s = v.refresh()
        assert s["mode"] == "full" and s["retrained"]
        _assert_index_matches(src, v)
        cent_v = v.centroids.current_version()
        # small append: growth 10/40 < 0.5 -> extend with frozen quantizer
        src.append(_vecs(spark, range(40, 50)))
        s = v.refresh()
        assert s["mode"] == "extend" and s["rows_assigned"] == 10
        assert not s["retrained"]
        assert v.centroids.current_version() == cent_v
        _assert_index_matches(src, v)
        # idempotent
        assert v.refresh()["mode"] == "noop"

    def test_growth_triggers_retrain(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(20)))
        v.refresh()
        cent_v = v.centroids.current_version()
        src.append(_vecs(spark, range(20, 60)))  # growth 2.0 > 0.5
        s = v.refresh()
        assert s["mode"] == "full" and s["retrained"]
        assert v.centroids.current_version() > cent_v
        _assert_index_matches(src, v)
        assert v.status()["growth_since_retrain"] == 0.0

    def test_upsert_recomputes_only_dirty(self, spark, view):
        src, v = view
        # several source commits -> several files, so the upsert's COW
        # rewrite (and with it the dirty-id set) is bounded by the ONE
        # file holding the touched keys, not the corpus
        for lo in range(0, 40, 10):
            src.append(_vecs(spark, range(lo, lo + 10)))
        v.refresh()
        before = {r["id"]: r["cell"]
                  for r in v.target.read().select("id", "cell").collect()}
        src.upsert_keyed(_vecs(spark, range(5), bump=40.0), "vec_id")
        s = v.refresh()
        assert s["mode"] == "recompute"
        # dirty = the rewritten file's rows (<= 10), never the corpus
        assert 5 <= s["rows_assigned"] <= 10
        _assert_index_matches(src, v)
        after = {r["id"]: r["cell"]
                 for r in v.target.read().select("id", "cell").collect()}
        assert all(after[i] == before[i] for i in range(10, 40))

    def test_erasure_cascades_to_index(self, spark, view):
        src, v = view
        # multi-file source so the erasure rewrite (and the dirty set)
        # stays a minority of the corpus — the recompute shape
        for lo in range(0, 40, 10):
            src.append(_vecs(spark, range(lo, lo + 10)))
        v.refresh()
        src.delete_keyed("vec_id", [3, 7])
        s = v.refresh()
        assert s["mode"] == "recompute"
        ids = {r["id"] for r in v.target.read().select("id").collect()}
        assert ids == set(range(40)) - {3, 7}
        _assert_index_matches(src, v)

    def test_churn_majority_escapes_to_retrain(self, spark, view):
        """An upsert churning most of the corpus must FULL-RETRAIN: the
        recompute would rewrite + reassign nearly everything against a
        quantizer that churn this large invalidated anyway, and the
        retrain path never needs the dirty-id set at all."""
        src, v = view
        src.append(_vecs(spark, range(40)))
        v.refresh()
        cent_v = v.centroids.current_version()
        src.upsert_keyed(_vecs(spark, range(35), bump=25.0), "vec_id")
        s = v.refresh()
        assert s["mode"] == "full" and s["retrained"]
        assert v.centroids.current_version() > cent_v
        _assert_index_matches(src, v)

    def test_recompute_threads_id_frame_not_list(self, spark, view,
                                                 monkeypatch):
        """Below the churn cap, the dirty ids reach delete_keyed as a
        DataFrame (distributed anti join), never a python list."""
        src, v = view
        for lo in range(0, 40, 10):
            src.append(_vecs(spark, range(lo, lo + 10)))
        v.refresh()
        from pyspark.sql import DataFrame

        seen = {}
        real = type(v.target).delete_keyed

        def spy(self, col, keys, **kw):
            seen["type"] = type(keys)
            return real(self, col, keys, **kw)

        monkeypatch.setattr(type(v.target), "delete_keyed", spy)
        src.upsert_keyed(_vecs(spark, range(5), bump=40.0), "vec_id")
        s = v.refresh()
        assert s["mode"] == "recompute"
        assert issubclass(seen["type"], DataFrame)
        _assert_index_matches(src, v)

    def test_compact_only_is_cursor_advance(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(20)))
        src.append(_vecs(spark, range(20, 30)))
        v.refresh()
        tgt_v = v.target.current_version()
        src.compact(small_bytes=1 << 30)
        s = v.refresh()
        assert s["mode"] == "cursor_only"
        assert v.target.current_version() == tgt_v
        assert v.refresh()["mode"] == "noop"

    def test_query_serves_pinned_quantizer(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(40)))
        v.refresh()
        src.append(_vecs(spark, range(40, 50)))
        v.refresh()  # extend
        q = _vecs(spark, [42])  # exact member: top-1 must be itself
        res = v.query_topk(q, k=3, nprobe=2).collect()
        assert len(res) == 3
        top = min(res, key=lambda r: r["rank"])
        assert top["cand_id"] == 42 and top["cos"] > 0.999999
        # identical to serving the raw frames directly
        st = v._train_state()
        direct = ivf_query_topk(
            v.centroids.read(version=st[1]), v.target.read(), q,
            k=3, nprobe=2).collect()
        assert sorted((r["cand_id"], r["rank"]) for r in res) == \
            sorted((r["cand_id"], r["rank"]) for r in direct)

    def test_status_before_first_refresh(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(10)))
        s = v.status()
        assert s["needs_retrain"] is True and s["trained_rows"] == 0
        assert s["rows_now"] == 10

    def test_centroid_pin_survives_expiry(self, spark, view):
        src, v = view
        src.append(_vecs(spark, range(20)))
        v.refresh()
        src.append(_vecs(spark, range(20, 60)))
        v.refresh()  # retrain -> centroids v2, tag moves
        v.centroids.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
        st = v._train_state()
        assert v.centroids.read(version=st[1]).count() > 0
        _assert_index_matches(src, v)
