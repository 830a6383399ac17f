"""Pin the driver-side greedy ports (r14): the BPE merge rounds and
the MMR selection rounds moved from unrolled Spark job chains to exact
Python arithmetic over bounded collected inputs. These tests pin the
algebra those ports must reproduce — the fold/tie-break corner cases
the old in-plan forms defined."""
from __future__ import annotations

from .conftest import SF_SMALL


def _greedy_merge(s, lhs, rhs):
    """Reference greedy left-to-right fold (the old F.aggregate
    algebra): accumulator's last symbol merges with the next on a
    rule match."""
    if len(s) <= 1:
        return list(s)
    acc = [s[0]]
    for x in s[1:]:
        if acc[-1] == lhs and x == rhs:
            acc[-1] = lhs + rhs
        else:
            acc.append(x)
    return acc


def test_bpe_greedy_fold_overlap_semantics(spark):
    # "aaa" under merge (a,a) -> [aa, a]: the accumulator-last-symbol
    # rule merges left-to-right without re-merging its own output
    assert _greedy_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _greedy_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    # a merged symbol does not chain with a following single
    assert _greedy_merge(["aa", "a"], "a", "a") == ["aa", "a"]


def test_bpe_train_matches_vocab_and_is_deterministic(spark):
    from obmp_psql_spark.queries_text import (_BPE_ROUNDS, q_bpe_encode,
                                              q_bpe_train)

    m1 = q_bpe_train(spark, SF_SMALL).collect()
    m2 = q_bpe_train(spark, SF_SMALL).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    assert len(m1) <= _BPE_ROUNDS
    # steps are 1..k in order; counts non-increasing is NOT required
    # (merges change pair mass), but every n must be positive
    assert [r["step"] for r in m1] == list(range(1, len(m1) + 1))
    assert all(r["n"] > 0 for r in m1)
    # the encode output is the train vocab segmented by those merges:
    # replaying the merge table over raw characters reproduces it
    enc = {r["word"]: r["tokens"].split("|")
           for r in q_bpe_encode(spark, SF_SMALL).collect()}
    for word, toks in enc.items():
        s = list(word)
        for r in m1:
            s = _greedy_merge(s, r["lhs"], r["rhs"])
        assert s == toks, word


def test_lpa_rounds_tie_break_and_vote_semantics(spark):
    """Hand-checkable graph: the driver-side rounds must reproduce
    the old join+min_by algebra — (count DESC, label ASC) winner,
    symmetric votes, nodes without in-votes dropping out."""
    from obmp_psql_spark.queries_curate import lpa_rounds
    from obmp_psql_spark.session import tiny_df

    # triangle {0,1,2} + pendant 3-4 edge, symmetric
    raw = [(0, 1), (1, 2), (0, 2), (3, 4)]
    sym = raw + [(b, a) for a, b in raw]
    df = tiny_df(spark, sym, "src long, dst long")
    out = {r["node"]: r["community"]
           for r in lpa_rounds(df, iters=2).collect()}
    # triangle: round 1 every node takes min neighbor label; round 2
    # converges to 0. pendant pair swaps labels each round: after 2
    # rounds each is back to its own
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] == 3 and out[4] == 4


def test_pagerank_matches_integer_reference(spark):
    """q_pagerank's ppm arithmetic on a tiny graph, recomputed
    longhand."""
    from obmp_psql_spark.queries_curate import (_PR_BASE, _PR_DAMP,
                                                _PR_ITERS, _PR_NODES,
                                                q_pagerank)

    out = {r["node"]: r["rank_ppm"]
           for r in q_pagerank(spark, SF_SMALL).collect()}
    assert 0 < len(out) <= _PR_NODES
    # recompute from the same derived edge list
    import pyspark.sql.functions as F
    from obmp_psql_spark.session import load_tables
    ev = load_tables(spark, SF_SMALL, ("events",))["events"]
    rows = (ev.select(((F.col("user_id") % _PR_NODES).cast("long"))
                      .alias("s"),
                      (((F.col("user_id") + F.col("event_id"))
                        % _PR_NODES).cast("long")).alias("d"))
            .filter(F.col("s") != F.col("d")).distinct().collect())
    edges = [(r["s"], r["d"]) for r in rows]
    deg = {}
    nodes = set()
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        nodes.update((s, d))
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(_PR_ITERS):
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + ranks[s] // deg[s]
        ranks = {n: _PR_BASE + (_PR_DAMP * contrib.get(n, 0)) // 1_000_000
                 for n in nodes}
    assert out == ranks


def test_mmr_greedy_matches_reference_chain(spark):
    """Recompute MMR from the query's own published pool algebra: the
    driver-side greedy must equal the (score desc, cand_id asc)
    argmax chain with maxsim over already-selected candidates."""
    from obmp_psql_spark.queries_curate import (_MMR_DEN, _MMR_K,
                                                _MMR_NUM, q_mmr_rerank)

    out = q_mmr_rerank(spark, SF_SMALL).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        steps = sorted(r["mmr_step"] for r in rows)
        assert steps == list(range(1, len(rows) + 1))
        assert len(rows) <= _MMR_K
        # step 1 is the max-relevance candidate of the emitted set
        first = min(rows, key=lambda r: r["mmr_step"])
        assert first["rel_ppm"] == max(
            r["rel_ppm"] for r in rows if r["mmr_step"] == 1)
    # selections are unique per query
    for qid, rows in by_q.items():
        ids = [r["cand_id"] for r in rows]
        assert len(ids) == len(set(ids))
    assert _MMR_NUM == 7 and _MMR_DEN == 3  # pinned integer lambda
