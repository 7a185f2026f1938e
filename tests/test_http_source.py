"""HTTP-API source through the generic plug point (sources/http_api.py):
the ExchangeRateHost tap semantics — fixed single stream, STATE-only
feature set, bookmark resume — driven end-to-end through job.json
(reference contract test/.../ExchangeRateHostTest.java:43-50)."""

import os

import pytest
from pyspark.sql import functions as F

from plugin_singer_spark.job import run_job
from plugin_singer_spark.lake.table import LakeTable


def make_marker_repo_fetch(marker_dir: str):
    """Fetch stand-in that records every invocation as a marker file
    (visible across local-mode Python worker processes) and delegates to
    the deterministic fake feed. A closure, so cloudpickle ships it by
    value — the same rule a user's injected fetch callable lives under."""

    def fetch(repos, since, until):
        from plugin_singer_spark.sources.http_api import fake_repo_events_fetch

        open(os.path.join(marker_dir, f"fetch_{since}_{until}_{os.getpid()}"), "w").close()
        return fake_repo_events_fetch(repos, since, until)

    return fetch


def make_marker_rates_fetch(marker_dir: str):
    def fetch(base, dates, currencies):
        from plugin_singer_spark.sources.http_api import fake_rates_fetch

        open(os.path.join(marker_dir, f"fetch_{dates[0]}_{len(dates)}_{os.getpid()}"), "w").close()
        return fake_rates_fetch(base, dates, currencies)

    return fetch


def _cfg(tmp_path, **src_extra):
    src = {
        "format": "generic",
        "reader": "plugin_singer_spark.sources.http_api:exchange_rate_reader",
        "stream": "exchange_rate",
        "base": "usd",
        "start_date": "2024-01-01",
        "end_date": "2024-01-10",
        "currencies": ["eur", "gbp", "jpy"],
    }
    src.update(src_extra)
    return {
        "table": {
            "path": str(tmp_path / "fx"),
            "keys": ["date", "currency"],
            "num_buckets": 2,
            "columns": {"date": "string", "base": "string",
                        "currency": "string", "rate": "double"},
        },
        "source": src,
        "replication_method": "INCREMENTAL",
        "replication_key": "seq",
        # exclusive bookmark edge: a rerun over the same window emits 0
        # (the reference's rerun-from-state contract)
        "start_always_inclusive": False,
        "checkpoint_id": "fx",
    }


def test_exchange_rate_bookmark_resume(spark, tmp_path):
    cfg = _cfg(tmp_path)
    out = run_job(spark, cfg)
    assert out["events"] == 30  # 10 days x 3 currencies
    assert out["final_rows"] == 30
    bm = out["bookmarks"]["exchange_rate"]
    assert bm["replication_key"] == "seq" and bm["replication_key_value"] == 20240110

    # rerun over the SAME window: everything is at/behind the bookmark → 0
    out2 = run_job(spark, cfg)
    assert out2["events"] == 0
    assert out2["final_rows"] == 30

    # the window advances: only the new days sync
    out3 = run_job(spark, _cfg(tmp_path, end_date="2024-01-12"))
    assert out3["events"] == 6  # 2 new days x 3 currencies
    assert out3["final_rows"] == 36

    # values round-trip deterministically (seedless md5 rates)
    t = LakeTable(spark, str(tmp_path / "fx"))
    row = t.read().filter((F.col("date") == "2024-01-01") & (F.col("currency") == "eur")).collect()[0]
    from plugin_singer_spark.sources.http_api import fake_rates_fetch

    expect = fake_rates_fetch("usd", ["2024-01-01"], ["eur"])[0]["rate"]
    assert row.rate == pytest.approx(expect, abs=0)


def test_registered_reader_name(spark):
    """The registry name from connectors.py TAPS resolves through
    register_source (importing the sources package registers it)."""
    import plugin_singer_spark.sources  # noqa: F401
    from plugin_singer_spark.job import _resolve_reader
    from plugin_singer_spark.sources.http_api import exchange_rate_reader

    assert _resolve_reader("exchange-rate-host") is exchange_rate_reader

    # injected fetch = the mocked HTTP boundary
    calls = []

    def fetch(base, dates, currencies):
        calls.append((base, tuple(dates), tuple(currencies)))
        return [{"date": d, "base": base, "currency": c, "rate": 1.0}
                for d in dates for c in currencies]

    df = exchange_rate_reader(
        spark, {"dates": ["2024-02-01", "2024-02-02"], "currencies": ["eur"], "fetch": fetch}
    )
    assert df.count() == 2 and calls == [("usd", ("2024-02-01", "2024-02-02"), ("eur",))]


def test_repo_events_distributed_paged_fetch(spark, tmp_path):
    """fetch_mode=distributed splits the seq window into page ranges and
    calls fetch INSIDE mapInPandas — ≥2 distinct per-page invocations on a
    multi-page window (marker files written by executor workers), and the
    rows are identical to the driver-side path (VERDICT r4 next #1)."""
    from plugin_singer_spark.sources.http_api import repo_events_reader

    markers = tmp_path / "markers"
    markers.mkdir()
    cfg = {
        "repos": ["org-a", "org-b"],
        "since_seq": 0,
        "until_seq": 1000,
        "page_size": 250,
        "fetch": make_marker_repo_fetch(str(markers)),
    }
    dist = repo_events_reader(spark, dict(cfg, fetch_mode="distributed"))
    got = sorted(tuple(r) for r in dist.collect())
    calls = os.listdir(markers)
    assert len(calls) == 4  # one fetch per 250-seq page
    # each invocation covers exactly its page range, nothing overlapping
    ranges = sorted(tuple(map(int, c.split("_")[1:3])) for c in calls)
    assert ranges == [(0, 250), (250, 500), (500, 750), (750, 1000)]

    driver = repo_events_reader(spark, dict(cfg, fetch_mode="driver", fetch=None))
    assert got == sorted(tuple(r) for r in driver.collect())
    assert dist.schema == driver.schema


def test_exchange_rate_distributed_matches_driver(spark, tmp_path):
    """Same parity for the rates source: auto mode pages a >page_days
    window through executors; rows/schema identical to driver mode."""
    from plugin_singer_spark.sources.http_api import exchange_rate_reader

    markers = tmp_path / "markers"
    markers.mkdir()
    cfg = {
        "base": "usd",
        "start_date": "2024-01-01",
        "end_date": "2024-03-10",  # 70 days
        "currencies": ["eur", "gbp"],
        "page_days": 20,
    }
    dist = exchange_rate_reader(spark, dict(cfg, fetch=make_marker_rates_fetch(str(markers))))
    got = sorted(tuple(r) for r in dist.collect())
    assert len(os.listdir(markers)) == 4  # ceil(70/20) pages, auto → distributed
    driver = exchange_rate_reader(spark, dict(cfg, fetch_mode="driver"))
    assert got == sorted(tuple(r) for r in driver.collect())
    assert dist.schema == driver.schema


def test_distributed_fetch_handles_empty_pages(spark):
    """A page whose fetch returns no rows yields nothing (a sparse feed —
    deleted history, quiet window) without breaking the Arrow schema."""
    from plugin_singer_spark.sources.http_api import repo_events_reader

    def sparse_fetch(repos, since, until):
        from plugin_singer_spark.sources.http_api import fake_repo_events_fetch

        return [] if since >= 500 else fake_repo_events_fetch(repos, since, min(until, 500))

    df = repo_events_reader(spark, {
        "repos": ["org-a"], "since_seq": 0, "until_seq": 1000,
        "page_size": 250, "fetch_mode": "distributed", "fetch": sparse_fetch,
    })
    assert df.count() == 500
    assert df.agg({"seq": "max"}).first()[0] == 499


def test_github_e2e_distributed_mode_same_final_state(spark, tmp_path):
    """The LOG_BASED e2e (fenced chunked MERGE) lands the identical final
    state whether the source fetched driver-side or page-distributed —
    and the distributed run additionally uses the staggered compaction
    profile (compact_rotate through job.json), so logical state is also
    invariant to the physical compaction schedule."""
    def cfg(root, mode):
        extra = {"compact_every": 1, "compact_rotate": 2} if mode == "distributed" else {}
        return {
            **extra,
            "table": {
                "path": str(tmp_path / root),
                "keys": ["repo", "path"],
                "num_buckets": 2,
                "columns": {"repo": "string", "path": "string", "commit": "string",
                            "lang": "string", "content": "string"},
            },
            "source": {"format": "generic", "reader": "github", "stream": "repos",
                       "repos": ["org-a", "org-b"], "since_seq": 0, "until_seq": 1000,
                       "batch_events": 400, "fetch_mode": mode, "page_size": 300},
            "replication_method": "LOG_BASED",
            "write_mode": "mor",
            "checkpoint_id": f"gh-{root}",
        }

    out_d = run_job(spark, cfg("gh_driver", "driver"))
    out_x = run_job(spark, cfg("gh_dist", "distributed"))
    assert out_d["events"] == out_x["events"] == 1000
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in LakeTable(spark, str(tmp_path / p)).read()
        .select("repo", "path", "commit", "lang", "content").collect()
    )
    assert rows("gh_driver") == rows("gh_dist")


def test_github_like_cdc_source_fenced_merge(spark, tmp_path):
    """GitHub-tap analog (taps/GitHub.java:81-120) through the generic
    plug point into the LOG_BASED path: API change events -> chunked
    fenced MERGE; a re-run of the same window is epoch-fenced to zero, a
    later window advances, and the final state matches the LWW oracle
    computed independently from the fake feed."""
    from plugin_singer_spark.sources.http_api import fake_repo_events_fetch

    def cfg(until):
        return {
            "table": {
                "path": str(tmp_path / "ghlake"),
                "keys": ["repo", "path"],
                "num_buckets": 2,
                "columns": {"repo": "string", "path": "string", "commit": "string",
                            "lang": "string", "content": "string"},
            },
            "source": {"format": "generic", "reader": "github", "stream": "repos",
                       "repos": ["org-a", "org-b"], "since_seq": 0, "until_seq": until,
                       "batch_events": 400},
            "replication_method": "LOG_BASED",
            "write_mode": "mor",
            "checkpoint_id": "gh",
        }

    out = run_job(spark, cfg(1000))
    assert out["events"] == 1000 and out["batches"] >= 2

    out2 = run_job(spark, cfg(1000))  # identical window: every epoch fenced
    assert out2["events"] == 0

    # window advances INTO the partially-filled tail epoch (epoch 2 covered
    # seqs 800..1199 but the stream ended at 999): the tail epoch re-runs
    # idempotently — 400 source rows read, the 200 genuinely new applied
    out3 = run_job(spark, cfg(1200))
    assert out3["events"] == 400

    # final state == independent LWW fold of the deterministic feed
    events = fake_repo_events_fetch(["org-a", "org-b"], 0, 1200)
    last = {}
    for e in events:  # seq-ordered by construction
        last[(e["repo"], e["path"])] = e
    expect = {(k[0], k[1], e["commit"]) for k, e in last.items() if e["op"] != "D"}
    t = LakeTable(spark, str(tmp_path / "ghlake"))
    got = {(r.repo, r.path, r.commit) for r in t.read().select("repo", "path", "commit").collect()}
    assert got == expect
