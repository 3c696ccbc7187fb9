# TPU VM image for ssgvc_tpu (the reference's Dockerfile targets CUDA 12.4;
# this targets Cloud TPU hosts — jax[tpu] + the native rANS toolchain).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY ssgvc_tpu ./ssgvc_tpu
COPY trainer_seg_video_model.py trainer_image_model.py bench.py ./
COPY configs ./configs

RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint pyyaml pillow \
    && pip install --no-cache-dir -e . \
    && make -C ssgvc_tpu/native

ENTRYPOINT ["python", "trainer_seg_video_model.py"]
