"""Geo-IP dimension + binder for the geo-ip-* query filters (SURVEY.md §2.3
F13; reference common/Query/Filters/GeoIPFilter.cs:11-54 + GeoIPCityFilter /
GeoIPSubDivisionFilter / GeoIPCoordinateFilter subclasses).

The reference looks each result's host IP up in the MaxMind city database.
MaxMind is external licensed data — out of scope — so the dimension here is a
deterministic synthetic ip→(country, city, subdivision, lat, lon) table keyed
on the engine's synthetic ``ip_group`` (operators/frontier.with_ip_group).
Attributes derive from md5 of the ip_group (NOT xxhash64) so the exact same
values are computable in ANSI SQL — the DuckDB oracle recomputes the whole
dimension inline and cross-checks the filter semantics end-to-end.

Scale shape: the dimension is bounded by the IP space (2^16 groups here; a
real MaxMind city db is ~3M blocks) — broadcast-join territory, never a
shuffle of the frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_COUNTRIES = ["US", "DE", "FR", "JP", "BR", "IN",
                 "GB", "CA", "AU", "ES", "IT", "NL"]
N_CITIES = 100
N_SUBDIVISIONS = 30


def _md5i(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 — the cross-engine
    deterministic 'hash' used throughout the oracle-checked operators."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def geo_cols(ip_group: Column) -> dict[str, Column]:
    """The synthetic geo attributes of one ip_group, as JVM expressions.
    Every derivation has an exact ANSI-SQL twin (see __spark_entry__
    ``geo_filter`` oracle)."""
    s = ip_group.cast("string")
    country_idx = F.pmod(_md5i(F.concat(s, F.lit(":c"))),
                         F.lit(len(GEO_COUNTRIES)))
    lat_m = F.pmod(_md5i(F.concat(s, F.lit(":lat"))), F.lit(180_000))
    lon_m = F.pmod(_md5i(F.concat(s, F.lit(":lon"))), F.lit(360_000))
    return {
        "geo_country": F.element_at(
            F.array(*[F.lit(c) for c in GEO_COUNTRIES]),
            (country_idx + 1).cast("int")),
        "geo_city": F.concat(
            F.lit("city"),
            F.pmod(_md5i(F.concat(s, F.lit(":t"))), F.lit(N_CITIES))
            .cast("string")),
        "geo_subdivision": F.concat(
            F.lit("sub"),
            F.pmod(_md5i(F.concat(s, F.lit(":s"))), F.lit(N_SUBDIVISIONS))
            .cast("string")),
        # raw IEEE arithmetic, no rounding: both engines compute the
        # identical double from the identical int64
        "geo_lat": lat_m / F.lit(1000.0) - F.lit(90.0),
        "geo_lon": lon_m / F.lit(1000.0) - F.lit(180.0),
    }


def geo_dim_df(spark: SparkSession, n_groups: int = 1 << 16) -> DataFrame:
    """The ip→geo dimension table (one row per ip_group)."""
    cols = geo_cols(F.col("ip_group"))
    return (spark.range(n_groups)
            .select(F.col("id").alias("ip_group"),
                    *[v.alias(k) for k, v in cols.items()]))


def bind_geo(df: DataFrame, geo: DataFrame) -> DataFrame:
    """Attach geo_* columns by broadcast join on ``ip_group`` — the bind
    step the geo-ip-* filters require (GeoIPFilter caches the host IP
    lookup per result; here the lookup is a dimension join, memoized by
    construction)."""
    return df.join(F.broadcast(geo), "ip_group", "left")
