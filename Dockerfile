# Deployment image for the imageclust-tpu service.
#
# Counterpart of the reference's 3-stage Dockerfile (node build -> Go+OpenCV
# source build -> slim runtime, Dockerfile:1-75). The frontend stage builds
# the React SPA source (frontend/src, vite) into frontend/build — falling
# back to the prebuilt dependency-free static page already committed there
# if npm is unavailable; no OpenCV source build is needed (wheels); the
# native runtime compiles in seconds. The image targets Cloud TPU VMs —
# the libtpu-enabled jax wheel is selected via the TPU extra.

FROM node:18-slim AS frontend
WORKDIR /fe
COPY frontend/ ./
# build/ ships prebuilt in the repo, so a failed npm install (e.g. no
# registry egress) degrades to the committed static page instead of
# aborting the image build — vite writes over build/ when it succeeds
RUN (npm install && npm run build) \
    || echo "npm unavailable: keeping prebuilt frontend/build"

FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY native/ native/
RUN make -C native

FROM python:3.12-slim
WORKDIR /app
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint aiohttp requests pyyaml numpy regex \
    opencv-python-headless pillow
COPY imageclust_tpu/ imageclust_tpu/
COPY --from=frontend /fe/build/ frontend/build/
COPY bench.py pyproject.toml README.md ./
COPY --from=build /app/native/libicnative.so native/libicnative.so

ENV IMAGECLUST_SERVICE_PORT=8080
EXPOSE 8080
CMD ["python", "-m", "imageclust_tpu.cli", "serve"]
