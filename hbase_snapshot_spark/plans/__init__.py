from hbase_snapshot_spark.plans.scan_exec import run_scan
