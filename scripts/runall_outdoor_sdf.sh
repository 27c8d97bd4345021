#!/bin/bash
# Outdoor SDF operating point (reference scripts/runall_outdoor_sdf.sh:1):
# COLMAP garden at bound 16 in SDF mode with dense-depth supervision at
# stage 0, then a short stage 1 with strong normal smoothing + remeshing.
set -e
python main.py data/garden/ --workspace trial_sdf_garden_ori -O --data_format colmap --bound 16 --scale 0.3 --enable_cam_center --stage 0 --sdf --downscale 4 --n_eval 1 --iters 15000 --clean_min_f 16 --clean_min_d 10 --visibility_mask_dilation 10 --decimate_target 1e5 --enable_dense_depth
python main.py data/garden/ --workspace trial_sdf_garden_ori -O --data_format colmap --bound 16 --scale 0.3 --enable_cam_center --stage 1 --sdf --downscale 4 --n_eval 1 --iters 5000 --lambda_normal 1e-1 --refine_remesh_size 0.01
