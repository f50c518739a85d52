# zebrapose_tpu runtime image (train/eval on TPU VMs).
# The reference ships CUDA images (docker/Dockerfile); TPU hosts get their
# accelerator runtime from the VM image, so this only layers the framework
# and its native library on a slim Python base.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/zebrapose_tpu
COPY pyproject.toml README.md ./
COPY zebrapose_tpu ./zebrapose_tpu
COPY native ./native
COPY bench.py __graft_entry__.py ./

# jax[tpu] must match the host TPU runtime; installed here by default.
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir . \
    && make -C native

ENTRYPOINT ["python", "-m", "zebrapose_tpu"]
