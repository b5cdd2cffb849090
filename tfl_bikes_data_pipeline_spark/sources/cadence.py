"""Ingest-cadence utilities (SURVEY.md §2.9 F8, §2.12 "file-name/date
resolution") — the driver-side calendar logic the reference runs in its
DAGs: previous-month computation for the monthly slice
(``airflow/dags/ingest_weather_data.py:26-68``), month bounds via
``calendar.monthrange``, and weekly-file resolution tolerant of the
feed's naming drift (``airflow/dags/ingest_bike_data.py:25-120``:
spaces, "JourneyDataExtract", date-range stems, xlsx strays).

Pure driver-side Python by design — this logic parameterizes Spark
jobs (which month to transform, which files belong to the month); it
never touches row data.
"""

from __future__ import annotations

import calendar
import re
from datetime import date, timedelta


def previous_month_yyyymm(today: date) -> str:
    """The YYYYMM the monthly jobs process: the month before ``today``
    (reference get_previous_month_as_yyyymm)."""
    first = today.replace(day=1)
    prev_end = first - timedelta(days=1)
    return f"{prev_end.year:04d}{prev_end.month:02d}"


def month_bounds(yyyymm: str) -> tuple[date, date]:
    """(first_day, last_day) of a YYYYMM month."""
    year, month = int(yyyymm[:4]), int(yyyymm[4:])
    return date(year, month, 1), date(
        year, month, calendar.monthrange(year, month)[1]
    )


_STEM_RE = re.compile(
    r"(?P<num>\d+)?\s*journey\s*data\s*extract\s*"
    r"(?P<start>\d{1,2})(?P<smon>[A-Za-z]{3})(?P<syear>\d{4})?-"
    r"(?P<end>\d{1,2})(?P<emon>[A-Za-z]{3})(?P<eyear>\d{4})",
    re.IGNORECASE,
)

_MONTHS = {m.lower(): i for i, m in enumerate(calendar.month_abbr) if m}


def parse_weekly_filename(name: str) -> tuple[date, date] | None:
    """Resolve a weekly usage file name to its (start, end) date range,
    tolerating the feed's drift: embedded spaces, optional extract
    number, missing start year, csv/xlsx extensions. Returns None for
    non-usage files."""
    m = _STEM_RE.search(name.replace("%20", " "))
    if not m:
        return None
    end_year = int(m.group("eyear"))
    end = date(end_year, _MONTHS[m.group("emon").lower()], int(m.group("end")))
    start_year = int(m.group("syear")) if m.group("syear") else end_year
    start_month = _MONTHS[m.group("smon").lower()]
    # unlabelled start year at the December→January boundary belongs to
    # the previous year
    if not m.group("syear") and start_month > end.month:
        start_year = end_year - 1
    start = date(start_year, start_month, int(m.group("start")))
    return start, end


def files_for_month(names: list[str], yyyymm: str) -> list[str]:
    """The weekly files whose range overlaps a month — the set the
    monthly transform re-reads (reference directory re-read semantics,
    ``spark/transform_load.py:457``)."""
    lo, hi = month_bounds(yyyymm)
    out = []
    for n in names:
        rng = parse_weekly_filename(n)
        if rng and rng[0] <= hi and rng[1] >= lo:
            out.append(n)
    return out
