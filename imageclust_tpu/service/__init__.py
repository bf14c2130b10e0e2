from imageclust_tpu.service.app import create_app, run_server
from imageclust_tpu.service.jobs import JobStore

__all__ = ["create_app", "run_server", "JobStore"]
