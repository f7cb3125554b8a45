# podtpu deployment image (packaging parity with the reference's Dockerfile,
# which preloads pretrained weights, creates the working directories and
# installs the package editable — /root/reference/Dockerfile:1-23).
#
# Base: a JAX TPU image (provide via build-arg; any image with jax[tpu],
# flax, optax installed works).
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        g++ make libjpeg-dev libpng-dev libtiff-dev \
    && rm -rf /var/lib/apt/lists/*

# Working directories (same contract as the reference: /models /data /obj_det).
RUN mkdir -p /models /data /obj_det/models /obj_det/crops /obj_det/classifiers

WORKDIR /app
COPY pyproject.toml README.md ./
COPY podtpu ./podtpu
COPY native ./native

RUN pip install --no-cache-dir -e . \
    && make -C native

# Optional: bake a pretrained torchvision checkpoint for --pretrained
# (the reference preloads fasterrcnn_resnet50_fpn_coco).
# COPY fasterrcnn_resnet50_fpn_coco.pth /models/

# Example commands in shell history, like the reference image.
RUN echo 'python -m podtpu.cli train-object-detector --tasks 1 --batch-size 4' >> /root/.bash_history \
    && echo 'python -m podtpu.cli infer-object-detector --tasks 1 --model model_name' >> /root/.bash_history \
    && echo 'python -m podtpu.cli crop-objects --tasks 1' >> /root/.bash_history

CMD ["/bin/bash"]
