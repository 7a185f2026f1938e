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


def register() -> None:
    """Register under the connector-registry name (connectors.py TAPS
    'exchange-rate-host')."""
    from plugin_singer_spark.job import register_source

    register_source("exchange-rate-host", exchange_rate_reader)


register()
