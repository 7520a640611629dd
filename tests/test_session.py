"""Session factory config plumbing."""

from auctus_spark.session import get_spark


def test_session_extra_confs(spark):
    """extra_confs entries land in the session config (the
    object-store recipe path — s3a/gs endpoints and credentials ride
    this into the Hadoop FS layer on a real cluster)."""
    s = get_spark("auctus_spark_tests", cores=8, shuffle_partitions=8,
                  extra_confs={"spark.auctus.objectstore.probe": "yes"})
    assert s.conf.get("spark.auctus.objectstore.probe") == "yes"
