#!/usr/bin/env bash
# Sample commands (mirrors the reference's run.sh usage patterns).
PKG=enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu

# Train depth (dataset options: simcol, c3vd, combined)
python -m $PKG.cli.train_depth dataset=c3vd model=large \
    dataset.batch_size=12 model.encoder_lr=5e-6 model.decoder_lr=5e-5 \
    trainer.max_epochs=20

# Test depth
CHECKPOINT_PATH="./checkpoints/simcol/mvitl_el5e-06_dl5e-05_b6_e30_dsimcol_p0.05" \
python -m $PKG.cli.test_depth dataset=simcol model=large dataset.batch_size=20

# Multi-chip / multi-host knobs (any train/test CLI): mesh shape + TP.
#   trainer.mesh_data=4 trainer.mesh_model=2 trainer.tensor_parallel=true
# FSDP/ZeRO (params + Adam moments sharded over the data axis; for models
# whose replicated optimizer state would not fit one chip's HBM):
#   trainer.fsdp=true
# Multi-host: one process per host with JAX_COORDINATOR_ADDRESS set (or
# trainer.distributed=true); loaders shard per process automatically.

# Train + test pose
python -m $PKG.cli.train_pose model.lr=1e-4 trainer.max_epochs=30

# Generate predicted depth maps (+ npy) for a dataset
python -m $PKG.cli.infer --encoder vitl \
    --load-from ./checkpoints/best.ckpt --max-depth 20 \
    -i datasets/SyntheticColon -d simcol --pred-only --grayscale
# ... optionally 18% faster with a small accuracy cost (README):
#     --batch-size 64 --token-merge 0.3
# ... or +14% at small batch via dynamic-int8 matmuls (README):
#     --batch-size 8 --int8
# ... both dials together: 100 fps at batch 8 (README):
#     --batch-size 8 --token-merge 0.3 --int8

# Point cloud + Poisson mesh from predicted depths + GT poses
python -m $PKG.cli.pointcloud -i datasets/SyntheticColon -o recon_out/

# Per-frame point clouds straight from the model
python -m $PKG.cli.pointcloud_model --encoder vitl \
    --load-from ./checkpoints/best.ckpt --max-depth 20 \
    -i datasets/SyntheticColon -o recon_frames/

# Video tools
python -m $PKG.cli.video_to_images --config configs/video_to_image_config.yaml
python -m $PKG.cli.convert_video input.avi -o output.mp4

# Offline evaluation
python -m $PKG.cli.eval_depth_offline --input-path datasets/SyntheticColon/
python -m $PKG.cli.calc_metrics --dataset-root datasets/SyntheticColon/
python -m $PKG.cli.calc_stats --ds simcol \
    --data-dir datasets/SyntheticColon --train-list datasets/SyntheticColon/train.txt

# Streaming watch-folder serving (futures engine; --once = drain and exit)
python -m $PKG.cli.serve --encoder vitl --load-from ./checkpoints/best.ckpt \
    -i incoming_frames/ -o depths/ --batch-size 8 --save-numpy

# One-shot video -> depth-video (native MJPEG demux -> engine -> mux)
python -m $PKG.cli.video_depth --encoder vitl --load-from ./checkpoints/best.ckpt \
    -i colon.avi -o colon_depth.mp4 --side-by-side --every-n 2

# AOT deployment: export the serving program once, replay with no re-trace
python -m $PKG.cli.export_model --encoder vitl --load-from ./checkpoints/best.ckpt \
    --frame-hw 475 1000 --batch-size 8 -o vitl.stablehlo --check
python -m $PKG.cli.serve --encoder vitl --load-from ./checkpoints/best.ckpt \
    -i incoming_frames/ -o depths/ --from-export vitl.stablehlo

# Multi-chip knobs (any trainer CLI): data/model mesh + TP/SP/FSDP/pipeline
python -m $PKG.cli.train_depth dataset=simcol model=large \
    trainer.mesh_data=4 trainer.mesh_model=2 trainer.tensor_parallel=true \
    trainer.seq_parallel=true
python -m $PKG.cli.train_depth dataset=simcol model=large trainer.fsdp=true
python -m $PKG.cli.train_depth dataset=simcol model=large \
    trainer.mesh_data=4 trainer.mesh_model=2 trainer.pipeline_parallel=2
