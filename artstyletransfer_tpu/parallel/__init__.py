from .mesh import (jobs_mesh, jobs_space_mesh,  # noqa: F401
                   multislice_jobs_space_mesh)
from .batch import (BatchedTransferJob, bucket_jobs,  # noqa: F401
                    max_jobs_per_batch, resolve_batch_policy, run_job_queue)
