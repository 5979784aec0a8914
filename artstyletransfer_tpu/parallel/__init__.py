from .mesh import jobs_mesh, jobs_space_mesh  # noqa: F401
from .batch import BatchedTransferJob, bucket_jobs, run_job_queue  # noqa: F401
