"""TsdbClient — the reference's full command surface on one object.

Maps all 16 wire commands (``/root/reference/src/tsdbserver/tokens.h:13-31``,
grammars at server.cc:245-327, Python bindings client.py:552-894) onto the
engine, so a user of the reference's Python client can switch by swapping
the import:

| wire command          | method                  | backing |
|-----------------------|-------------------------|---------|
| CREATE_DATABASE       | create_database         | catalog |
| CREATE_MEASUREMENT    | create_measurement      | catalog |
| WRITE_POINTS          | write_points            | sources.writer |
| SELECT_POINTS_LIMIT   | select_points_limit     | operators.select |
| SELECT_POINTS_LAST    | select_points_last      | operators.select |
| DELETE_POINTS         | delete_points           | operators.delete |
| GET_SCHEMA            | get_schema              | catalog |
| LIST_DATABASES        | list_databases          | catalog |
| LIST_MEASUREMENTS     | list_measurements       | catalog |
| LIST_SERIES           | list_series             | catalog |
| ACTIVE_SERIES         | active_series           | operators.series |
| COUNT_POINTS          | count_points            | operators.count |
| SUM_POINTS            | sum_points (+mean)      | operators.windowed |
| INTEGRATE_POINTS      | integrate_points        | operators.integral |
| NOP                   | nop                     | catalog |
| AUTHENTICATE          | authenticate            | catalog (PBKDF2 passwd) |

Results stream back as Arrow record batches (``to_arrow_batches``) — the
analog of the reference's columnar DT_CHUNK wire frames (S7/S8,
server.cc:628-733, client.py:152-317).

Open ranges: the reference's ``t1 = 2^64-1`` convention is accepted and
clamped to signed-long range at this edge (client.py:1035 → SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from simple_tsdb_spark.catalog import TsdbCatalog
from simple_tsdb_spark.functions.timeutil import MAX_TIME_NS


class TsdbClient:
    """``require_auth=True`` replicates the reference server's
    authenticated-listener behavior (server.cc:1021-1035): every command
    raises NotAuthenticated until AUTHENTICATE succeeds.  The default
    (False) matches its unauthenticated local listener.  SSL transport
    itself stays a deployment concern — only the credential check (D9,
    root.cc:94-145) is engine behavior."""

    def __init__(self, spark: SparkSession, warehouse: str, *, require_auth: bool = False):
        self.spark = spark
        self.catalog = TsdbCatalog(spark, warehouse)
        self._require_auth = bool(require_auth)
        self._authenticated = not self._require_auth

    def _check_auth(self) -> None:
        if not self._authenticated:
            from simple_tsdb_spark.errors import NotAuthenticated

            raise NotAuthenticated("AUTHENTICATE required before any other command")

    # -- catalog commands ----------------------------------------------
    def create_database(self, database: str) -> None:
        self._check_auth()
        self.catalog.create_database(database)

    def create_measurement(self, database: str, measurement: str, fields: dict[str, str]) -> None:
        self._check_auth()
        self.catalog.create_measurement(database, measurement, fields)

    def get_schema(self, database: str, measurement: str) -> list[tuple[str, str]]:
        self._check_auth()
        return self.catalog.get_schema(database, measurement)

    def list_databases(self) -> list[str]:
        self._check_auth()
        return self.catalog.list_databases()

    def list_measurements(self, database: str) -> list[str]:
        self._check_auth()
        return self.catalog.list_measurements(database)

    def list_series(self, database: str, measurement: str) -> list[str]:
        self._check_auth()
        return self.catalog.list_series(database, measurement)

    def nop(self) -> bool:
        self._check_auth()
        return self.catalog.nop()

    def add_user(self, username: str, password: str) -> None:
        self.catalog.add_user(username, password)

    def authenticate(self, username: str, password: str) -> bool:
        """AUTHENTICATE (server.cc:963-1068): verify against the root's
        PBKDF2-SHA512 passwd file; unlocks the session on success."""
        ok = self.catalog.verify_user(username, password)
        if ok:
            self._authenticated = True
        return ok

    # -- data commands --------------------------------------------------
    def _df(self, database: str, measurement: str) -> DataFrame:
        self._check_auth()
        return self.catalog.read(database, measurement)

    def write_points(self, database: str, measurement: str, batch: DataFrame, *, mode: str = "strict"):
        self._check_auth()
        from simple_tsdb_spark.sources.writer import write_points

        return write_points(
            self.spark, self.catalog.measurement_path(database, measurement), batch, mode=mode
        )

    def write_points_pandas(
        self, database: str, measurement: str, pdf, *, mode: str = "strict"
    ):
        """Driver-resident (pandas) batch append — one-Spark-job fast
        lane for the wire server's point-scale writes; semantics
        identical to ``write_points``."""
        self._check_auth()
        from simple_tsdb_spark.sources.writer import write_points_pandas

        return write_points_pandas(
            self.spark,
            self.catalog.measurement_path(database, measurement),
            pdf,
            self.catalog.spark_schema(database, measurement),
            mode=mode,
        )

    def delete_points(self, database: str, measurement: str, series: str, t: int):
        self._check_auth()
        from simple_tsdb_spark.operators import delete_points

        return delete_points(
            self.spark, self.catalog.measurement_path(database, measurement), series=series, t=t
        )

    def select_points_limit(
        self, database: str, measurement: str, series: str,
        fields: Sequence[str] | None = None, t0: int = 0, t1: int = 2**64 - 1,
        limit: int | None = None,
    ) -> DataFrame:
        from simple_tsdb_spark.operators import select_points

        return select_points(
            self._df(database, measurement), series=series, fields=fields,
            t0=t0, t1=min(t1, MAX_TIME_NS), limit=limit,
        )

    def select_points_last(
        self, database: str, measurement: str, series: str,
        fields: Sequence[str] | None = None, t0: int = 0, t1: int = 2**64 - 1,
        last: int = 1,
    ) -> DataFrame:
        from simple_tsdb_spark.operators import select_last_points

        return select_last_points(
            self._df(database, measurement), series=series, fields=fields,
            t0=t0, t1=min(t1, MAX_TIME_NS), last=last,
        )

    def count_points(
        self, database: str, measurement: str, series: str,
        t0: int = 0, t1: int = 2**64 - 1,
    ):
        from simple_tsdb_spark.operators import count_points

        return count_points(
            self._df(database, measurement), series=series,
            t0=t0, t1=min(t1, MAX_TIME_NS), per_series=False,
        )

    def sum_points(
        self, database: str, measurement: str, series: str, window_ns: int,
        fields: Sequence[str] | None = None, t0: int = 0, t1: int = 2**64 - 1,
    ) -> DataFrame:
        from simple_tsdb_spark.operators import RetentionWatermarks, sum_points

        # Use the recorded time_first (writer sidecar) to skip the
        # alignment-anchor scan when available for this series.
        marks = RetentionWatermarks(self.catalog.measurement_path(database, measurement))
        tf = {series: marks.get(series)} if series in marks._marks else None
        return sum_points(
            self._df(database, measurement), series=series, fields=fields,
            t0=t0, t1=min(t1, MAX_TIME_NS), window_ns=window_ns, time_first=tf,
        )

    def mean_points(
        self, database: str, measurement: str, series: str, window_ns: int,
        fields: Sequence[str] | None = None, t0: int = 0, t1: int = 2**64 - 1,
    ) -> DataFrame:
        """Windowed MEAN — the reference's client derives this from
        SUM_POINTS (client.py:1103-1120); here it is a first-class call."""
        from simple_tsdb_spark.operators import RetentionWatermarks, mean_points

        marks = RetentionWatermarks(self.catalog.measurement_path(database, measurement))
        tf = {series: marks.get(series)} if series in marks._marks else None
        return mean_points(
            self._df(database, measurement), series=series, fields=fields,
            t0=t0, t1=min(t1, MAX_TIME_NS), window_ns=window_ns, time_first=tf,
        )

    def integrate_points(
        self, database: str, measurement: str, series: str,
        fields: Sequence[str] | None = None, t0: int = 0, t1: int = 2**64 - 1,
    ) -> DataFrame:
        from simple_tsdb_spark.operators import integrate_points

        return integrate_points(
            self._df(database, measurement), series=series, fields=fields,
            t0=t0, t1=min(t1, MAX_TIME_NS),
        )

    def active_series(
        self, database: str, measurement: str, t0: int = 0, t1: int = 2**64 - 1
    ) -> list[str]:
        from simple_tsdb_spark.operators import list_active_series

        return [
            r["series"]
            for r in list_active_series(
                self._df(database, measurement), t0=t0, t1=min(t1, MAX_TIME_NS)
            ).collect()
        ]

    # -- result streaming (S7/S8) ---------------------------------------
    @staticmethod
    def to_arrow_batches(df: DataFrame) -> Iterator:
        """Stream a result as Arrow record batches — the engine-side
        equivalent of the reference's columnar DT_CHUNK frames."""
        return df.toArrow().to_batches()
