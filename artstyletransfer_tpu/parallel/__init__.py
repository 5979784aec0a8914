from .mesh import (default_serving_mesh, jobs_mesh,  # noqa: F401
                   jobs_space_mesh, multislice_jobs_space_mesh)
from .batch import (BatchedTransferJob, bucket_jobs,  # noqa: F401
                    max_jobs_per_batch, resolve_batch_policy, run_job_queue)
