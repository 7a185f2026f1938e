"""Sample generic-source reader for the dotted-path resolution test."""


def read_sample(spark, src_cfg):
    return spark.createDataFrame([(1, "I", "r", "p")], "seq long, op string, repo string, path string")
