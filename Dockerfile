# TPU deployment image for artstyletransfer_tpu.
#
# Counterpart of the reference's CUDA image (reference Dockerfile:1-37,
# nvidia/cuda base + torch cu121 wheels + a build-time smoke run that warms
# the VGG19 weight cache). TPU runtimes ship via the libtpu wheel rather
# than a vendor base image.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY artstyletransfer_tpu ./artstyletransfer_tpu
COPY bench.py __graft_entry__.py ./

# jax[tpu] pulls libtpu; cv2/scipy accelerate host-side preprocessing
RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir optax opencv-python-headless scipy \
        aiohttp jinja2 \
    && pip install --no-cache-dir -e .

# build the native image-ops library
RUN make -C artstyletransfer_tpu/native

# Optional: bake VGG19 weights into the image (the reference warms its
# torch cache the same way, Dockerfile:33). Provide the file at build time:
#   docker build --build-arg VGG19_WEIGHTS=vgg19.npz ...
ARG VGG19_WEIGHTS=
RUN if [ -n "$VGG19_WEIGHTS" ]; then \
        mkdir -p /root/.cache/artstyletransfer_tpu && \
        cp "$VGG19_WEIGHTS" /root/.cache/artstyletransfer_tpu/vgg19_features.npz; \
    fi

# smoke check (CPU): the package and the default entrypoint (the lab,
# which needs the frontend deps) must import
RUN JAX_PLATFORMS=cpu python -c \
    "import artstyletransfer_tpu, artstyletransfer_tpu.frontends.lab"

EXPOSE 8080
# web lab by default; the bot runs with ASTT_TELEGRAM_TOKEN set:
#   docker run -e ASTT_TELEGRAM_TOKEN=... image \
#       python -m artstyletransfer_tpu.frontends.tlbot
ENTRYPOINT ["python", "-m", "artstyletransfer_tpu.frontends.lab"]
