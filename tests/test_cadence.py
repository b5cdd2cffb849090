"""Calendar-cadence utilities: month math and drift-tolerant weekly
file resolution (reference DAG logic)."""

from datetime import date

from tfl_bikes_data_pipeline_spark.sources.cadence import (
    files_for_month,
    month_bounds,
    parse_weekly_filename,
    previous_month_yyyymm,
)


def test_previous_month_including_year_boundary():
    assert previous_month_yyyymm(date(2021, 3, 10)) == "202102"
    assert previous_month_yyyymm(date(2021, 1, 9)) == "202012"


def test_month_bounds_leap_and_plain():
    assert month_bounds("202002") == (date(2020, 2, 1), date(2020, 2, 29))
    assert month_bounds("202104") == (date(2021, 4, 1), date(2021, 4, 30))


def test_parse_weekly_filename_drift_variants():
    assert parse_weekly_filename("246JourneyDataExtract30Dec2020-05Jan2021.csv") == (
        date(2020, 12, 30),
        date(2021, 1, 5),
    )
    # embedded spaces / url-encoding / xlsx stray
    assert parse_weekly_filename("247%20Journey%20Data%20Extract%2006Jan2021-12Jan2021.xlsx") == (
        date(2021, 1, 6),
        date(2021, 1, 12),
    )
    # full years on both sides
    assert parse_weekly_filename("10a Journey Data Extract 24May2017-30May2017.csv") == (
        date(2017, 5, 24),
        date(2017, 5, 30),
    )
    assert parse_weekly_filename("stations.xml") is None


def test_files_for_month_overlap_semantics():
    names = [
        "246JourneyDataExtract30Dec2020-05Jan2021.csv",  # straddles into Jan
        "247JourneyDataExtract06Jan2021-12Jan2021.csv",
        "251JourneyDataExtract03Feb2021-09Feb2021.csv",
        "readme.txt",
    ]
    assert files_for_month(names, "202101") == names[:2]
    assert files_for_month(names, "202102") == [names[2]]
