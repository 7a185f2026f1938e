"""HTTP-API time-series source: the ExchangeRateHost tap re-expressed
through the engine's generic source plug point.

Reference: ``taps/ExchangeRateHost.java:55-82`` — a STATE-only tap (no
catalog, no discovery; Feature set ``{STATE}`` at :55-59) with ONE fixed
stream ``exchange_rate`` and a three-knob config (``base``,
``start_date``, ``end_date``, :62-72). Its test contract
(``test/.../ExchangeRateHostTest.java:43-50``): one fixed-schema stream,
>0 records for the window, a bookmark STATE — and a rerun from the saved
state emits nothing new.

Engine shape: an HTTP time-series API returns ONE small payload per
request — that is driver-side control-plane work by nature, so the reader
fetches driver-side (the ``fetch`` callable is the HTTP boundary; inject
``requests``-backed fetchers in deployments, the deterministic fake in
tests) and parallelizes the typed rows into a DataFrame. Everything
downstream — bookmark filtering, MERGE, sinks — is the same distributed
pipeline every other source uses: the reader plugs in via
``job.register_source`` / a ``pkg.mod:fn`` reader spec
(``source.format = "generic"``), which is exactly the GenericTap
extension contract (taps/GenericTap.java:28-77).

The change-sequence ``seq`` is the date as yyyymmdd — monotone in time, so
INCREMENTAL replication on ``seq`` gives the reference's bookmark-resume
behavior (rerun with ``start_always_inclusive=False`` → 0 new records,
the BigQuery-style exclusive edge, taps/BigQuery.java:52-58).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession, types as T

STREAM = "exchange_rate"  # fixed single stream (ExchangeRateHostTest.java:44)
DEFAULT_CURRENCIES = ("eur", "gbp", "jpy")

RATE_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("base", T.StringType(), False),
        T.StructField("currency", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# (base, dates, currencies) -> iterable of {date, base, currency, rate}
RatesFetch = Callable[[str, list[str], list[str]], Iterable[dict]]


def _date_range(start_date: str, end_date: str) -> list[str]:
    d0 = _dt.date.fromisoformat(start_date)
    d1 = _dt.date.fromisoformat(end_date)
    return [(d0 + _dt.timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)]


def fake_rates_fetch(base: str, dates: list[str], currencies: list[str]) -> list[dict]:
    """Deterministic stand-in for the HTTP call: rate(base, cur, date) =
    0.5 + (md5-hash60('fx:<base>:<cur>:<date>') % 10000) / 10000 — the
    repo's standard seedless md5 idiom, reproducible in ANSI SQL so the
    driver oracle can verify the full plug-point path end-to-end."""
    out = []
    for date in dates:
        for cur in currencies:
            h = int(hashlib.md5(f"fx:{base}:{cur}:{date}".encode()).hexdigest()[:15], 16)
            out.append(
                {
                    "date": date,
                    "base": base,
                    "currency": cur,
                    "rate": 0.5 + (h % 10000) / 10000.0,
                }
            )
    return out


def exchange_rate_reader(spark: SparkSession, src: dict) -> DataFrame:
    """Generic-source reader ``(spark, source_cfg) → DataFrame`` for the
    exchange-rate stream. Config (reference knobs,
    taps/ExchangeRateHost.java:62-72): ``base`` (default "usd"),
    ``start_date``/``end_date`` ISO dates (or an explicit ``dates`` list),
    ``currencies``, and optionally ``fetch`` — the injected HTTP boundary
    (defaults to the deterministic fake)."""
    base = str(src.get("base", "usd")).lower()
    currencies = [c.lower() for c in src.get("currencies", DEFAULT_CURRENCIES)]
    dates = src.get("dates") or _date_range(src["start_date"], src["end_date"])
    fetch: RatesFetch = src.get("fetch") or fake_rates_fetch
    rows = [
        (
            r["date"],
            r["base"],
            r["currency"],
            float(r["rate"]),
            int(r["date"].replace("-", "")),
        )
        for r in fetch(base, list(dates), currencies)
    ]
    return spark.createDataFrame(rows, RATE_SCHEMA)


# ---------------------------------------------------------------------------
# GitHub-tap analog: an API source for the engine's own input domain
# ---------------------------------------------------------------------------

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)

_LANGS = ("py", "java", "ts", "md")


def fake_repo_events_fetch(repos: list[str], since_seq: int, until_seq: int) -> list[dict]:
    """Deterministic stand-in for a code-hosting API's commit feed
    (taps/GitHub.java:81-110 — repos list + start_date window): event i of
    repo r touches path ``src/f<md5-derived>.py``-style files with
    md5-derived commit ids and contents; every 11th event is a delete.
    The same (repo, seq) always produces the same event — replays and
    window re-fetches are byte-identical, which is what makes the fenced
    CDC path testable against it."""
    out = []
    for seq in range(since_seq, until_seq):
        r = repos[seq % len(repos)]
        h = hashlib.md5(f"gh:{r}:{seq}".encode()).hexdigest()
        is_del = seq % 11 == 10
        out.append(
            {
                "seq": seq,
                "op": "D" if is_del else ("I" if seq % 3 == 0 else "U"),
                "repo": r,
                "path": f"src/f{int(h[:4], 16) % 50}.{_LANGS[seq % 4]}",
                "commit": h,
                "lang": _LANGS[seq % 4],
                "content": None if is_del else hashlib.md5(f"v:{h}".encode()).hexdigest(),
            }
        )
    return out


def repo_events_reader(spark: SparkSession, src: dict) -> DataFrame:
    """Generic-source reader for a GitHub-like commit-event API — the
    LOG_BASED twin of :func:`exchange_rate_reader` (reference analog:
    taps/GitHub.java:81-120, the source-code-repo API tap; SURVEY §2.3
    maps it onto the engine's repos input domain). Config: ``repos`` list,
    ``since_seq``/``until_seq`` window, optional injected ``fetch``. The
    returned frame carries (seq, op) change columns, so it flows through
    replay_chunked's fenced micro-batched MERGE like any binlog."""
    repos = list(src.get("repos") or ["org-0"])
    since = int(src.get("since_seq", 0))
    until = int(src.get("until_seq", since + 1000))
    fetch = src.get("fetch") or fake_repo_events_fetch
    rows = [
        (int(r["seq"]), r["op"], r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in fetch(repos, since, until)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def register() -> None:
    """Register under the connector-registry names (connectors.py TAPS
    'exchange-rate-host' / 'github')."""
    from plugin_singer_spark.job import register_source

    register_source("exchange-rate-host", exchange_rate_reader)
    register_source("github", repo_events_reader)


register()
