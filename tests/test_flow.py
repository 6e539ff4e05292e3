"""Conversation-flow analytics (operators/flow.py): hand-computed
transition matrix / latency percentiles / tool usage on a tiny fixed
transcript, plus partition-count invariance (the property that matters
for deterministic corpus analytics at scale)."""

import datetime as dt

import pytest

# A two-conversation corpus with known gaps (seconds after t0):
#   c1: user@0 -> assistant@10 -> tool@12(search) -> assistant@13 -> user@20
#   c2: user@0 -> assistant@4  -> user@9 -> assistant@14 -> tool@15(calc)
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _corpus(spark):
    rows = []
    for conv, seq in (
        (
            "c1",
            [
                ("user", None, 0),
                ("assistant", None, 10),
                ("tool", "search", 12),
                ("assistant", None, 13),
                ("user", None, 20),
            ],
        ),
        (
            "c2",
            [
                ("user", None, 0),
                ("assistant", None, 4),
                ("user", None, 9),
                ("assistant", None, 14),
                ("tool", "calc", 15),
            ],
        ),
    ):
        for i, (role, tool, off) in enumerate(seq):
            rows.append(
                (conv, i, role, f"{conv}-t{i}", tool, T0 + dt.timedelta(seconds=off))
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def _by_key(df, *keys):
    return {tuple(r[k] for k in keys): r.asDict() for r in df.collect()}


class TestRoleTransitions:
    def test_matrix_counts_and_shares(self, spark):
        from feasts_spark.operators.flow import role_transitions

        out = _by_key(role_transitions(_corpus(spark)), "role_from", "role_to")
        # user->assistant: c1@10, c2@4, c2@5 (9->14); assistant->tool:
        # c1@2, c2@1; tool->assistant: c1@1; assistant->user: c1@7, c2@5.
        assert out[("user", "assistant")]["n"] == 3
        assert out[("user", "assistant")]["n_convs"] == 2
        assert out[("assistant", "tool")]["n"] == 2
        assert out[("tool", "assistant")]["n"] == 1
        assert out[("assistant", "user")]["n"] == 2
        # user rows go only to assistant -> share 1; assistant splits 2/2.
        assert out[("user", "assistant")]["share"] == pytest.approx(1.0)
        assert out[("assistant", "tool")]["share"] == pytest.approx(0.5)
        assert out[("assistant", "user")]["share"] == pytest.approx(0.5)
        # latency: user->assistant gaps are [10, 4, 5] -> mean 19/3,
        # p50 = 5, p90 = linear interp between 5 and 10 at rank 1.8 -> 9.
        ua = out[("user", "assistant")]
        assert ua["mean_s"] == pytest.approx(19 / 3)
        assert ua["p50_s"] == pytest.approx(5.0)
        assert ua["p90_s"] == pytest.approx(9.0)

    def test_first_turns_excluded(self, spark):
        from feasts_spark.operators.flow import role_transitions

        total = role_transitions(_corpus(spark)).agg({"n": "sum"}).first()[0]
        assert total == 8  # 10 turns - 2 conversation openers


class TestToolUsage:
    def test_per_tool_rows(self, spark):
        from feasts_spark.operators.flow import tool_usage

        out = _by_key(tool_usage(_corpus(spark)), "tool")
        assert set(out) == {("search",), ("calc",)}
        assert out[("search",)]["n"] == 1
        assert out[("search",)]["mean_s"] == pytest.approx(2.0)
        assert out[("calc",)]["mean_s"] == pytest.approx(1.0)
        assert out[("search",)]["share"] == pytest.approx(0.5)

    def test_opening_tool_turn_counts_without_latency(self, spark):
        from feasts_spark.operators.flow import tool_usage

        df = spark.createDataFrame(
            [("c3", 0, "tool", "t", "boot", T0)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        row = tool_usage(df).first()
        assert row["n"] == 1 and row["mean_s"] is None and row["p50_s"] is None


class TestConvFlowPack:
    def test_tagged_union_schema_and_invariance(self, spark):
        from feasts_spark.operators.flow import conv_flow

        base = conv_flow(_corpus(spark))
        re = conv_flow(_corpus(spark).repartition(7, "text"))
        key = lambda r: (r["tag"], r["k1"], r["k2"] or "")
        a = sorted(base.collect(), key=key)
        b = sorted(re.collect(), key=key)
        assert [r.asDict() for r in a] == [r.asDict() for r in b]
        tags = {r["tag"] for r in a}
        assert tags == {"pair", "tool"}
        # row-stochastic: shares out of each role_from sum to 1
        from collections import defaultdict

        s = defaultdict(float)
        for r in a:
            if r["tag"] == "pair":
                s[r["k1"]] += r["share"]
        assert all(abs(v - 1.0) < 1e-12 for v in s.values())

    def test_pack_equals_standalone_operators(self, spark):
        """The fused GROUPING SETS pack must reproduce the standalone
        role_transitions / tool_usage values exactly."""
        from feasts_spark.operators.flow import (
            conv_flow,
            role_transitions,
            tool_usage,
        )

        corpus = _corpus(spark)
        packed = {
            (r["tag"], r["k1"], r["k2"]): r.asDict()
            for r in conv_flow(corpus).collect()
        }
        stats = ["n", "n_convs", "share", "mean_s", "p50_s", "p90_s", "p99_s"]
        for r in role_transitions(corpus).collect():
            p = packed[("pair", r["role_from"], r["role_to"])]
            assert [p[c] for c in stats] == [r[c] for c in stats]
        for r in tool_usage(corpus).collect():
            p = packed[("tool", r["tool"], None)]
            assert [p[c] for c in stats] == [r[c] for c in stats]
        assert len(packed) == 4 + 2  # 4 observed pairs + 2 tools
