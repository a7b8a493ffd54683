"""Property-fuzz of the RFC 9309 group selector (functions/robots.py:
_group_rule_text): random group layouts (stacked User-agent lines,
named/star/other tokens, empty groups, preamble rules, comments,
crawl-delays) must select the IDENTICAL merged rule text on three
engines — Spark, DuckDB (the gate oracle's CTE block), and a ~20-line
pure-Python reference selector."""

from __future__ import annotations

import random
import re

import duckdb
import pandas as pd
import pytest

_UA_SPLIT = re.compile(r"(?i)user-agent[ \t]*:")
_TOK = re.compile(r"^[ \t]*([^ \t\r\n#]*)")
_DIRECTIVE = re.compile(r"(?im)^[ \t]*(allow|disallow|crawl-delay)[ \t]*:")


def reference_selector(body: str, user_agent: str | None) -> str | None:
    """The RFC 9309 §2.2.1 selection in plain Python: segments after
    each User-agent line; stacked agent lines bind the first FOLLOWING
    rule-bearing segment; named groups override '*' (even with zero
    rules); merged text is the position-ordered concat of the chosen
    rule segments (deduped)."""
    segs = _UA_SPLIT.split(body)[1:]          # pos 0 preamble: ignored
    toks = [_TOK.match(s).group(1).lower() for s in segs]
    has = [bool(_DIRECTIVE.search(s)) for s in segs]
    rpos = {}
    nxt = None
    for p in range(len(segs) - 1, -1, -1):
        if has[p]:
            nxt = p
        rpos[p] = nxt
    def claimed(tok):
        return {rpos[p] for p, t in enumerate(toks)
                if t == tok and rpos[p] is not None}
    star = claimed("*")
    if user_agent is None:
        chosen = star
    else:
        ua = user_agent.strip().lower()
        chosen = claimed(ua) if ua in toks else star
    if not chosen:
        return None
    return "\n".join(segs[p] for p in sorted(chosen))


def _random_body(rng: random.Random) -> str:
    paths = ["/", "/a", "/a/b", "/tmp/*", "/x$", "/priv ate"]
    agents = ["*", "corpusbot", "CorpusBot", "otherbot", "bot#c", ""]
    def rule():
        kind = rng.choice(["Allow", "Disallow", "Crawl-delay",
                           "disallow", "# comment only"])
        if kind == "# comment only":
            return "# stray comment"
        if kind == "Crawl-delay":
            return f"Crawl-delay: {rng.choice(['1', '2.5', '10'])}"
        return f"{kind}: {rng.choice(paths + [''])}"

    parts = []
    if rng.random() < 0.3:                     # preamble rules (ignored)
        parts.append(rule())
    for _ in range(rng.randint(1, 4)):         # groups
        for _ in range(rng.randint(1, 3)):     # stacked UA lines
            parts.append(f"User-agent: {rng.choice(agents)}")
            if rng.random() < 0.2:
                parts.append("")               # blank line inside stack
        for _ in range(rng.randint(0, 3)):     # group rules (0 = empty)
            parts.append(rule())
    return "\n".join(parts) + ("\n" if rng.random() < 0.5 else "")


def _spark_merged(spark, bodies, user_agent):
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        _group_rule_text)

    df = spark.createDataFrame(list(enumerate(bodies)),
                               "dom long, body string")
    out = _group_rule_text(df, "body", "dom", user_agent)
    return {r.dom: r.seg for r in out.collect()}


def _duckdb_merged(bodies, user_agent):
    from simpy__kafka__flink__kafka_spark.plans.dataprep import (
        _robots_group_ctes)

    pdf = pd.DataFrame({"dom": range(len(bodies)), "body": bodies})
    con = duckdb.connect()
    con.register("bodies", pdf)
    sql = (f"WITH bod AS (SELECT dom, body FROM bodies),\n"
           f"{_robots_group_ctes(ua=user_agent)}\n"
           f"SELECT dom, seg FROM merged")
    return dict(con.execute(sql).fetchall())


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("user_agent", [None, "corpusbot"])
def test_group_selector_three_engine_fuzz(spark, seed, user_agent):
    rng = random.Random(seed)
    bodies = [_random_body(rng) for _ in range(40)]
    want = {i: m for i, b in enumerate(bodies)
            if (m := reference_selector(b, user_agent)) is not None}
    got_spark = _spark_merged(spark, bodies, user_agent)
    got_duck = _duckdb_merged(bodies, user_agent)
    assert got_spark == want
    assert got_duck == want


def test_reference_selector_pinned_cases():
    """Anchor the reference itself on the hand-derived RFC cases, so a
    three-way agreement can't be three copies of one misreading."""
    body = ("User-agent: a\nUser-agent: *\n\nDisallow: /x\n"
            "User-agent: b\nAllow: /y\n")
    # stacked a/* share the first rule-bearing segment (the '*' one)
    assert "Disallow: /x" in reference_selector(body, None)
    assert "Allow: /y" not in reference_selector(body, None)
    assert "Allow: /y" in reference_selector(body, "B")
    # empty named group still overrides '*'
    empty = "User-agent: *\nDisallow: /\nUser-agent: bot\n"
    assert reference_selector(empty, "bot") is None
    assert "Disallow: /" in reference_selector(empty, None)
