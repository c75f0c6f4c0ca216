"""Date functions (SURVEY §2.10 date/time, §4.3 hard spot #1).

French-locale formatting is implemented with explicit lookup arrays so the
output is deterministic regardless of JVM locale (the reference depends on
``locale.setlocale`` — process_open_data.py:10 vs update_open_data.py:10
disagree; we pin one explicit mapping).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# index 1..7 = Monday..Sunday (ISO dayofweek via weekday + 1)
_FR_DAYS = ["lundi", "mardi", "mercredi", "jeudi", "vendredi", "samedi", "dimanche"]
# index 1..12
_FR_MONTHS = [
    "janvier", "février", "mars", "avril", "mai", "juin",
    "juillet", "août", "septembre", "octobre", "novembre", "décembre",
]


def french_date_str(col: Column) -> Column:
    """``%A %d %B %Y`` in French (process_open_data.py:95,
    update_open_data.py:116-131), e.g. ``samedi 14 mars 2026`` —
    deterministic, locale-independent.
    """
    day_name = F.array(*[F.lit(d) for d in _FR_DAYS])[F.weekday(col)]
    month_name = F.array(*[F.lit(m) for m in _FR_MONTHS])[F.month(col) - 1]
    return F.concat_ws(
        " ",
        day_name,
        F.date_format(col, "dd"),
        month_name,
        F.date_format(col, "yyyy"),
    )


def availability_calendar(
    event_dates: Column,
    start: str = "2019-01-01",
    end: str = "2022-01-01",
    out_format: str = "d-MM-yyyy",
    sep: str = "|",
) -> Column:
    """Availability = fixed date range minus the event's own dates, joined
    with ``|`` (process_open_data.py:50-70: the reference loops row-by-row
    over a precomputed 1097-day list; here it is
    ``sequence``/``array_except``/``array_join`` — per-row array ops, no
    shuffle, no Python).

    ``event_dates`` is an array<date> column of occupied dates.
    """
    full_range = F.sequence(
        F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
    )
    free = F.array_except(full_range, event_dates)
    return F.array_join(F.transform(free, lambda d: F.date_format(d, out_format)), sep)


def consecutive_run(dates: Column) -> Column:
    """True when a distinct date array is one consecutive run
    (update_open_data.py:130-134: ``max-min == count-1`` over ordinals)."""
    distinct = F.array_distinct(dates)
    return F.datediff(F.array_max(distinct), F.array_min(distinct)) == F.size(distinct) - 1


def duration_label(n_days: Column) -> Column:
    """``'N jour(s)'`` wording (update_open_data.py:122-126)."""
    return F.concat(
        n_days.cast("string"),
        F.when(n_days == 1, F.lit(" jour")).otherwise(F.lit(" jours")),
    )
