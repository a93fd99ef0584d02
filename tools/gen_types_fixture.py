#!/usr/bin/env python3
"""Generate src/test/resources/cases/annotated-types.parquet — the
q_describe_types fixture carrying every logical-type annotation the
reference's schema printer distinguishes (internal/pqutil/parquet.go
LogicalOrConvertedAnnotation: INT(bits, signed), DECIMAL(p, s),
TIMESTAMP(unit, utc), plus STRING/DATE via the generic uppercase arm),
so describe-annotation parity is pinned against a fixture that actually
exercises the vocabulary instead of being UTF8-coupled (VERDICT r9
item 8). Deterministic: fixed rows, snappy, one row group.
"""
import datetime
import decimal
import os

import pyarrow as pa
import pyarrow.parquet as pq

out = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/cases/annotated-types.parquet")

table = pa.table({
    "s":   pa.array(["alpha", "beta", "gamma"], pa.string()),
    "i8":  pa.array([1, 2, 3], pa.int8()),
    "i16": pa.array([10, 20, 30], pa.int16()),
    "i32": pa.array([100, 200, 300], pa.int32()),
    "i64": pa.array([1000, 2000, 3000], pa.int64()),
    "u32": pa.array([1, 2, 3], pa.uint32()),
    "dec": pa.array([decimal.Decimal("1.25"), decimal.Decimal("2.50"),
                     decimal.Decimal("3.75")], pa.decimal128(9, 2)),
    "ts_us": pa.array([datetime.datetime(2024, 1, 1, 12, 0, 0,
                                         tzinfo=datetime.timezone.utc)] * 3,
                      pa.timestamp("us", tz="UTC")),
    "ts_ms": pa.array([datetime.datetime(2024, 1, 1, 12, 0, 0,
                                         tzinfo=datetime.timezone.utc)] * 3,
                      pa.timestamp("ms", tz="UTC")),
    # nanos has NO converted_type (logical-type-only) — pins the oracle's
    # logical_type-string parse against the one unit converted_type drops
    "ts_ns": pa.array([datetime.datetime(2024, 1, 1, 12, 0, 0,
                                         tzinfo=datetime.timezone.utc)] * 3,
                      pa.timestamp("ns", tz="UTC")),
    "d":   pa.array([datetime.date(2024, 1, 1)] * 3, pa.date32()),
    "dbl": pa.array([1.0, 2.0, 3.0], pa.float64()),
})
pq.write_table(table, out, compression="snappy")
print(f"wrote {out}: {table.num_rows} rows")
