# Container build (reference Dockerfile analogue).  CPU JAX by default;
# swap the jax install for jax[tpu] on a TPU VM.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY ndt_tpu ./ndt_tpu
COPY scripts ./scripts
RUN pip install --no-cache-dir .

# render the sample scene:  docker run -v $PWD/images:/app/images ndt-tpu \
#     ndt -d 4 -f 1 -r 640x480
CMD ["ndt", "-d", "4", "-f", "1", "-r", "640x480"]
