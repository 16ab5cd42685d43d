"""Timestamp kernels.

Parity: tolerant parsing + UTC coercion + ISO output of
ref:utils/misc.py:64-102 (``get_datetime_from_str`` / ``get_timestamp``) and
``Metadata.get_timestamp`` (ref:core/metadata.py:136-150). Errors return
None/'' instead of logging — in the pipeline a bad timestamp is a null cell,
not an exception.
"""

from __future__ import annotations

from datetime import datetime, timezone

try:
    from dateutil.parser import parse as _parse_dt
except ImportError:  # pragma: no cover - dateutil ships with pandas
    _parse_dt = None


def parse_datetime(dt_str: str, fmt: str | None = None, dayfirst: bool = True) -> datetime | None:
    """Parse a datetime string, optionally with an explicit format.
    Parity: ref:utils/misc.py:64-77."""
    try:
        if fmt:
            return datetime.strptime(dt_str, fmt)
        if _parse_dt is None:
            return datetime.fromisoformat(dt_str)
        return _parse_dt(dt_str, dayfirst=dayfirst)
    except (ValueError, OverflowError):
        return None


def to_utc_iso(ts, dayfirst: bool = True) -> str:
    """Consistent timestamp normalization: str/int/float/datetime → UTC ISO
    string ('' on failure/empty). Parity: ref:utils/misc.py:80-102
    (utc=True, iso=True path: tzinfo is *replaced* with UTC, not converted)."""
    if not ts:
        return ""
    try:
        if isinstance(ts, str):
            # fast path ONLY for dayfirst=False (the extract hot path):
            # strict-ISO strings then parse identically under fromisoformat
            # and dateutil, and dateutil's general parser is ~10× slower.
            # With dayfirst=True the reference's parity quirk applies —
            # dateutil swaps day/month EVEN for ISO strings
            # (ref:utils/misc.py:80-99, pinned by test_timekit) — so that
            # path must stay on dateutil.
            parsed = None
            if not dayfirst:
                try:
                    parsed = datetime.fromisoformat(ts)
                except ValueError:
                    parsed = None
            if parsed is None:
                parsed = _parse_dt(ts, dayfirst=dayfirst) if _parse_dt else None
                if parsed is None:
                    return ""
            ts = parsed
        if isinstance(ts, (int, float)):
            ts = datetime.fromtimestamp(ts)
        ts = ts.replace(tzinfo=timezone.utc)
        return ts.isoformat()
    except Exception:
        return ""
