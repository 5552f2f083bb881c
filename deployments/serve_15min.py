# Prefect wrapper serving the graft Spark orchestration on the same
# 15-minute cron as the reference deployment (serve_15min.py:5-14):
# the flow's only job is to spark-submit graft.pipeline.SubmitMain with
# the reference's served parameters. Requires only the public `prefect`
# package; nothing here runs at import time.
#
#   pip install prefect
#   python deployments/serve_15min.py
#
# No-Prefect alternative: deployments/crontab.example.
import subprocess
from pathlib import Path

from prefect import flow

# resolve against this file, not the worker's CWD — a served flow may run
# from anywhere (systemd unit, Prefect worker dir)
GRAFT_JAR = str(
    Path(__file__).resolve().parent.parent
    / "target/scala-2.13/salesforceprefectetlpipelinespark_2.13-0.1.0-SNAPSHOT.jar"
)


@flow(name="graft-etl-orchestrator")
def graft_etl_orchestrator(
    object_name: str = "Account",
    base_dir: str = "/tmp/graft_serve",
    timestamp_raw: bool = True,
    fail_on_qa_error: bool = False,
):
    subprocess.run(
        [
            "spark-submit",
            "--class", "graft.pipeline.SubmitMain",
            GRAFT_JAR,
            "--object", object_name,
            "--base-dir", base_dir,
            "--timestamp-raw", str(timestamp_raw).lower(),
            "--fail-on-qa", str(fail_on_qa_error).lower(),
        ],
        check=True,  # a failed pipeline (exit 1) fails the flow run
    )


if __name__ == "__main__":
    graft_etl_orchestrator.serve(
        name="graft-etl-orchestrator-15min",
        cron="*/15 * * * *",  # every 15 minutes
        parameters={
            "object_name": "Account",
            "timestamp_raw": True,
            "fail_on_qa_error": False,
        },
        tags=["orchestrator", "scheduled"],
    )
