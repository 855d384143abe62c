"""D1–D8/D10/D11 — catalog and admin surface.

Reference (``/root/reference/src/libtsdb/root.cc``, ``measurement.cc``):
a root directory tree with databases as directories, measurements as
fixed-schema directories (atomic tmp+rename create, idempotent only for an
identical schema — measurement.cc:66-151), series as subdirectories.

Spark mapping: a warehouse directory; database = subdirectory; measurement
= Parquet dataset + a persisted JSON schema; series = partition values.
Auth (D9): PBKDF2 passwd file below (reference-KDF-compatible).

The seven reference field types map to Spark types per SURVEY.md §1.2:
bool→boolean, u32→long, u64→long (values >2^63 unsupported on the fast
path), f32→float, f64→double, i32→int, i64→long.  ``u64f`` is the
full-range u64 variant: DECIMAL(20,0) holds all of 0..2^64-1 exactly at
the cost of decimal arithmetic — pick it only for fields that genuinely
use the top bit (the reference stores raw u64 and sums in double either
way, sum_op.h:33).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reference type name → Spark type (measurement.h:22-31 via SURVEY §1.2)
FIELD_TYPES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "u32": T.LongType(),
    "u64": T.LongType(),
    "u64f": T.DecimalType(20, 0),  # full-range u64 (see module docstring)
    "f32": T.FloatType(),
    "f64": T.DoubleType(),
    "i32": T.IntegerType(),
    "i64": T.LongType(),
}

MAX_FIELDS = 64  # constants.h:33
_NAME_RE = re.compile(r"^[A-Za-z0-9_\-.]{1,124}$")  # schema_entry name[124]


from simple_tsdb_spark.errors import (
    InvalidName,
    MeasurementExists,
    NoSuchDatabase,
    NoSuchMeasurement,
    TooManyFields,
)


class TsdbCatalog:
    """Thin catalog over a warehouse directory (reference root, D1)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        from simple_tsdb_spark.fs import get_fs

        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.fs = get_fs(warehouse)
        self.fs.mkdirs(self.warehouse)

    # -- databases (D2, D3) --------------------------------------------
    def create_database(self, name: str) -> None:
        self._check_name(name)
        self.fs.mkdirs(f"{self.warehouse}/{name}")

    def list_databases(self) -> list[str]:
        return sorted(
            d for d in self.fs.listdir(self.warehouse)
            if self.fs.isdir(f"{self.warehouse}/{d}")
        )

    # -- measurements (D4, D5, D6) -------------------------------------
    def measurement_path(self, database: str, measurement: str) -> str:
        return f"{self.warehouse}/{database}/{measurement}"

    def create_measurement(
        self, database: str, measurement: str, fields: dict[str, str]
    ) -> None:
        """``fields``: name → reference type ('f64', 'u32', ...).

        Idempotent for an identical schema — identical INCLUDING field
        order, since schema order is meaningful (projection defaults, D6);
        raises MeasurementExists for a conflicting one
        (measurement.cc:120-151, order-sensitive memcmp of the field
        list).  Raises NoSuchDatabase when the database was never created
        (root.cc behavior — measurements cannot implicitly create it).
        """
        self._check_name(measurement)
        if not self.fs.isdir(f"{self.warehouse}/{database}"):
            raise NoSuchDatabase(f"no such database: {database}")
        if len(fields) > MAX_FIELDS:
            raise TooManyFields(f"too many fields ({len(fields)} > {MAX_FIELDS})")
        for fname, ftype in fields.items():
            self._check_name(fname)
            if ftype not in FIELD_TYPES:
                raise ValueError(f"unknown field type {ftype!r} for {fname!r}")
        path = self.measurement_path(database, measurement)
        schema_file = f"{path}/_tsdb_meta/schema.json"
        if self.fs.exists(schema_file):
            existing = json.loads(self.fs.read_text(schema_file))
            # dict == ignores order; the reference's identical-schema check
            # compares the ordered field list.
            if list(existing.items()) != list(fields.items()):
                raise MeasurementExists(
                    f"{database}/{measurement} exists with a different schema"
                )
            return
        # atomic create, like the reference's tmp+rename
        self.fs.write_text_atomic(schema_file, json.dumps(fields))

    def list_measurements(self, database: str) -> list[str]:
        db = f"{self.warehouse}/{database}"
        if not self.fs.isdir(db):
            raise NoSuchDatabase(f"no such database: {database}")
        return sorted(d for d in self.fs.listdir(db) if self.fs.isdir(f"{db}/{d}"))

    def get_schema(self, database: str, measurement: str) -> list[tuple[str, str]]:
        """(name, reference-type) pairs in schema order (D6)."""
        schema_file = (
            f"{self.measurement_path(database, measurement)}/_tsdb_meta/schema.json"
        )
        if not self.fs.exists(schema_file):
            raise NoSuchMeasurement(f"no such measurement: {database}/{measurement}")
        return list(json.loads(self.fs.read_text(schema_file)).items())

    def spark_schema(self, database: str, measurement: str) -> T.StructType:
        entries = [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
        ]
        for fname, ftype in self.get_schema(database, measurement):
            entries.append(T.StructField(fname, FIELD_TYPES[ftype], True))
        return T.StructType(entries)

    def read(self, database: str, measurement: str) -> DataFrame:
        from simple_tsdb_spark.sources.writer import data_root

        mpath = self.measurement_path(database, measurement)
        # Read through the declared schema: files written before a field
        # was added (D10 add_field) surface it as NULL — schema evolution
        # with zero data movement.
        schema = self.spark_schema(database, measurement)
        df = (
            self.spark.read.schema(schema)
            .parquet(data_root(mpath))
            .select(*[f.name for f in schema.fields])
        )
        from simple_tsdb_spark.operators.delete import RetentionWatermarks

        return RetentionWatermarks(mpath).apply(df)

    # -- series (D7) ----------------------------------------------------
    def list_series(self, database: str, measurement: str) -> list[str]:
        """Partition-directory listing — no data scan, like the
        reference's readdir (measurement.h:72-77).  On a hashed-series
        layout the directory names carry hash buckets, not series, so
        this falls back to a column-pruned distinct scan (dictionary-
        encoded series column; one cluster job)."""
        from simple_tsdb_spark.sources.writer import _layout, data_root

        mpath = self.measurement_path(database, measurement)
        path = data_root(mpath)
        if _layout(mpath).get("series_buckets"):
            df = self.spark.read.parquet(path)
            return sorted(
                r["series"] for r in df.select("series").distinct().collect()
            )
        return sorted(
            e.split("=", 1)[1]
            for e in self.fs.listdir(path)
            if e.startswith("series=") and self.fs.isdir(f"{path}/{e}")
        )

    # -- users / auth (D9) ----------------------------------------------
    #: Reference KDF parameters (root.cc:97): PBKDF2-SHA512 with salt
    #: ``username + "tsdb75D8"`` and 10000 iterations — kept identical so
    #: a passwd file is portable between the engines.
    PBKDF2_SALT_SUFFIX = "tsdb75D8"
    PBKDF2_ITERATIONS = 10_000

    def _passwd_entries(self) -> dict[str, str]:
        p = f"{self.warehouse}/passwd"
        if not self.fs.exists(p):
            return {}
        out: dict[str, str] = {}
        for line in self.fs.read_text(p).splitlines():
            parts = line.split()
            if len(parts) == 2:
                out[parts[0]] = parts[1]
        return out

    def _kdf(self, username: str, password: str) -> str:
        import hashlib

        return hashlib.pbkdf2_hmac(
            "sha512",
            password.encode(),
            (username + self.PBKDF2_SALT_SUFFIX).encode(),
            self.PBKDF2_ITERATIONS,
        ).hex()

    def add_user(self, username: str, password: str) -> None:
        """One ``user hash`` line in the root's passwd file
        (root.cc:94-118); raises UserExists on re-add."""
        from simple_tsdb_spark.errors import UserExists

        if not username or any(c.isspace() for c in username):
            raise InvalidName(f"invalid username: {username!r}")
        users = self._passwd_entries()
        if username in users:
            raise UserExists(f"user already exists: {username}")
        users[username] = self._kdf(username, password)
        # atomic publish (the reference flocks instead)
        self.fs.write_text_atomic(
            f"{self.warehouse}/passwd",
            "".join(f"{u} {h}\n" for u, h in users.items()),
        )

    def verify_user(self, username: str, password: str) -> bool:
        """True iff the password matches (root.cc:120-145); raises
        NoSuchUser for an unknown name — the reference distinguishes the
        two outcomes."""
        import hmac

        from simple_tsdb_spark.errors import NoSuchUser

        users = self._passwd_entries()
        if username not in users:
            raise NoSuchUser(f"no such user: {username}")
        return hmac.compare_digest(users[username], self._kdf(username, password))

    # -- schema evolution (D10) ----------------------------------------
    def add_field(self, database: str, measurement: str, name: str, ftype: str) -> None:
        """Append a new nullable field to a measurement's schema.

        The reference ships an offline UPDATE-SCHEMA migration utility
        (``tsdbcli2/main.cc:302-385``); with Parquet this is metadata-only:
        old files simply lack the column and read as NULL (schema merging).
        """
        self._check_name(name)
        if ftype not in FIELD_TYPES:
            raise ValueError(f"unknown field type {ftype!r}")
        schema_file = (
            f"{self.measurement_path(database, measurement)}/_tsdb_meta/schema.json"
        )
        if not self.fs.exists(schema_file):
            raise NoSuchMeasurement(f"no such measurement: {database}/{measurement}")
        fields = json.loads(self.fs.read_text(schema_file))
        if name in fields:
            if fields[name] != ftype:
                raise MeasurementExists(f"field {name!r} exists with type {fields[name]!r}")
            return
        fields[name] = ftype
        self.fs.write_text_atomic(schema_file, json.dumps(fields))

    # -- misc (D11) -----------------------------------------------------
    def nop(self) -> bool:
        return self.spark.sql("SELECT 1").first()[0] == 1

    @staticmethod
    def _check_name(name: str) -> None:
        if not _NAME_RE.match(name):
            raise InvalidName(f"invalid name: {name!r}")
