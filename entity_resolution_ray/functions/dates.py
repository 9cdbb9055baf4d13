"""Date/time standardization kernels (SURVEY.md §2.2).

Reference analogues: ``DateStandardisationVisitor`` — DATE spans validated to
``Y-M-D`` via two independent parsers agreeing
(``am_combiner/features/date.py:28-122``) — and ``TimeStandardisationVisitor``
— strptime pattern sweep + regex fallback to ``HH:MM:SS``
(``am_combiner/features/time.py:9-118``).  No external dateparser here: a
deterministic strptime pattern sweep with a sanity window, which is the same
validation contract (reject unparseable / out-of-range strings).
"""

from __future__ import annotations

import re
from datetime import datetime

_DATE_PATTERNS = [
    "%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%d %B %Y", "%B %d, %Y", "%d %b %Y",
    "%b %d, %Y", "%Y/%m/%d", "%d.%m.%Y", "%Y",
]
_TIME_PATTERNS = ["%H:%M:%S", "%H:%M", "%I:%M %p", "%I:%M:%S %p", "%I %p"]
_TIME_RE = re.compile(r"\b(\d{1,2}):(\d{2})(?::(\d{2}))?\s*(am|pm|AM|PM)?\b")


def standardize_date(text: str, min_year: int = 1000, max_year: int = 2100) -> str | None:
    """Parse a date-ish string → 'YYYY-MM-DD' ('YYYY-01-01' for bare years);
    None when no pattern matches or the year is implausible."""
    t = (text or "").strip()
    if not t:
        return None
    for pattern in _DATE_PATTERNS:
        try:
            dt = datetime.strptime(t, pattern)
        except ValueError:
            continue
        if min_year <= dt.year <= max_year:
            return dt.strftime("%Y-%m-%d")
    return None


def standardize_time(text: str) -> str | None:
    """Parse a time-ish string → 'HH:MM:SS'; None when unparseable."""
    t = (text or "").strip()
    for pattern in _TIME_PATTERNS:
        try:
            return datetime.strptime(t, pattern).strftime("%H:%M:%S")
        except ValueError:
            continue
    m = _TIME_RE.search(t)
    if not m:
        return None
    hh, mm, ss, ampm = m.groups()
    h = int(hh)
    if ampm and ampm.lower() == "pm" and h < 12:
        h += 12
    if ampm and ampm.lower() == "am" and h == 12:
        h = 0
    if not (0 <= h <= 23 and 0 <= int(mm) <= 59):
        return None
    return f"{h:02d}:{int(mm):02d}:{int(ss or 0):02d}"
