"""Conversion settings, mirroring the reference ``Settings`` struct.

Reference: pq2json/src/settings.rs:1-17 (fields) and pq2json/src/main.rs:136-147
(flag wiring). Each field is an operator modifier applied by
``operators.convert`` as a Column-expression rewrite, not a per-row branch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class TimestampRendering(str, Enum):
    """Timestamp output modes (pq2json/src/settings.rs:12-16, main.rs:60-73).

    - TICKS : 100 ns ticks since 0001-01-01T00:00:00 (Kusto/.NET epoch);
      ``ms * 10_000 + 621_355_968_000_000_000``; overflow -> null
      (converter.rs:305-317).
    - ISO_STR : ``%Y-%m-%dT%H:%M:%S.%6fZ`` — second fraction always 6 digits,
      out-of-range -> null (converter.rs:318-329).
    - UNIX_MS : raw milliseconds since the Unix epoch (converter.rs:330).

    The reference CLI default is ISO_STR (main.rs:64).
    """

    TICKS = "ticks"
    ISO_STR = "isostr"
    UNIX_MS = "unixms"


#: .NET ticks at the Unix epoch (converter.rs:305).
TICKS_AT_UNIX_EPOCH = 621_355_968_000_000_000
#: 100ns ticks per millisecond.
TICKS_PER_MS = 10_000
#: i64::MAX — tick values beyond this render as null (converter.rs:310-316).
I64_MAX = (1 << 63) - 1
U64_WRAP = 1 << 64


@dataclass
class ConvertOptions:
    """Engine-side equivalent of the reference ``Settings``
    (pq2json/src/settings.rs:1-17).

    omit_nulls       : drop null entries from objects/maps (main.rs:13-18).
    omit_empty_bags  : render empty objects ``{}`` as null (main.rs:20-25).
    omit_empty_lists : render empty arrays ``[]`` as null (main.rs:27-32).
    prune            : shorthand enabling all three (main.rs:42-51).
    convert_types    : reinterpret uint64 as signed int64 (main.rs:34-40,
                       converter.rs:297-303).
    csv              : CSV sink instead of JSON-Lines (main.rs:53-58).
    timestamp_rendering : see TimestampRendering (default isostr, main.rs:64).
    columns          : optional projection list; names absent from the file
                       are emitted as null columns instead of failing
                       (converter.rs:46-50, 61-93, 160-169).
    """

    omit_nulls: bool = False
    omit_empty_bags: bool = False
    omit_empty_lists: bool = False
    convert_types: bool = False
    csv: bool = False
    timestamp_rendering: TimestampRendering = TimestampRendering.ISO_STR
    columns: list[str] | None = None

    @classmethod
    def pruned(cls, **kw) -> "ConvertOptions":
        """The ``--prune`` shorthand (main.rs:42-51)."""
        kw.setdefault("omit_nulls", True)
        kw.setdefault("omit_empty_bags", True)
        kw.setdefault("omit_empty_lists", True)
        return cls(**kw)
