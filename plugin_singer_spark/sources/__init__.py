"""Worked source connectors built on the generic plug point
(job.register_source — the GenericTap analog, taps/GenericTap.java:28-77).

Importing a module here registers its readers by name; jobs can also
address them directly as ``pkg.mod:fn`` reader specs.
"""

from plugin_singer_spark.sources.http_api import (  # noqa: F401
    exchange_rate_reader,
    fake_rates_fetch,
)
