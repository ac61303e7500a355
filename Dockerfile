# TPU-host image for f5tts-tpu (reference ships a CUDA Dockerfile; this one
# targets Cloud TPU VMs where the libtpu runtime is provided by the host).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/f5tts-tpu
COPY pyproject.toml README.md ./
COPY f5tts_tpu ./f5tts_tpu

RUN pip install --no-cache-dir -e .[train,compat] \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# build the native segmenter ahead of time
RUN python -c "from f5tts_tpu.native.segmenter import build; build()" || true

ENTRYPOINT ["f5tts-tpu-infer"]
