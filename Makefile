# Canonical run recipes, mirroring the reference's per-task Makefiles
# († coperception/tools/{det,seg,track}/Makefile — SURVEY.md §2.2).
# Variables: COM (strategy), DATA (dataset root/cache or 'synthetic'),
# LOG (run dir), EPOCHS.

COM    ?= disco
DATA   ?= synthetic
LOG    ?= runs/$(COM)
EPOCHS ?= 100
FLAGS  ?=

.PHONY: test bench create_data train_det test_det train_seg test_seg track \
        train_det_all smoke native profile xprof

test_fast:  # iteration lane, ~7 min warm (skips in-test training / dryruns)
	python -m pytest tests/ -q -m "not slow"

test:
	python -m pytest tests/ -q

bench:
	python bench.py

profile:  # cumulative stage budget + prepare/train timing (real chip)
	python -m v2x_sim_tpu.tools.profile_det --batch 16 --train 1

xprof:    # per-HLO-op self times of the predict step (real chip)
	python -m v2x_sim_tpu.tools.xprof_det --what predict

native:
	python -c "from v2x_sim_tpu.native.loader import native_available; \
	           assert native_available(); print('libv2xloader.so OK')"

create_data:
	python -m v2x_sim_tpu.tools.create_data_det --root $(DATA) --savepath cache

train_det:
	python -m v2x_sim_tpu.tools.train_det --data $(DATA) --com $(COM) \
	    --nepoch $(EPOCHS) --logpath $(LOG) $(FLAGS)

test_det:
	python -m v2x_sim_tpu.tools.test_det --data $(DATA) --com $(COM) \
	    --resume auto --logpath $(LOG) --save_dets $(LOG)/dets $(FLAGS)

train_seg:
	python -m v2x_sim_tpu.tools.train_seg --data $(DATA) --com $(COM) \
	    --nepoch $(EPOCHS) --logpath $(LOG)-seg $(FLAGS)

test_seg:
	python -m v2x_sim_tpu.tools.test_seg --data $(DATA) --com $(COM) \
	    --resume auto --logpath $(LOG)-seg $(FLAGS)

track: test_det
	python -m v2x_sim_tpu.tools.track --dets $(LOG)/dets

# Train every collaboration mode (the reference benchmark sweep).
train_det_all:
	for com in lowerbound upperbound sum mean max cat agent \
	           when2com who2com v2v disco; do \
	    $(MAKE) train_det COM=$$com LOG=runs/$$com || exit 1; \
	done

# Fast CPU end-to-end sanity (small grid, synthetic).
smoke:
	python -m v2x_sim_tpu.tools.train_det --cpu --grid small --com mean \
	    --nepoch 1 --batches_per_epoch 2 --batch 1 --logpath /tmp/v2x_smoke
	python -m v2x_sim_tpu.tools.test_det --cpu --grid small --com mean \
	    --resume auto --logpath /tmp/v2x_smoke --num_batches 1 --batch 1 \
	    --save_dets /tmp/v2x_smoke/dets
	python -m v2x_sim_tpu.tools.track --dets /tmp/v2x_smoke/dets

# Benchmark tables: per-mode mAP (det) / mIoU (seg) / MOTA-HOTA (track)
# on synthetic occluded scenes — the reference's three per-task README
# tables, reproducible offline.
bench_table:
	python -m v2x_sim_tpu.tools.bench_table --cpu --grid tiny \
	    --steps 600 --width_mult 0.25 --match center --out BENCH_TABLE.md
bench_table_seg:
	python -m v2x_sim_tpu.tools.bench_table --task seg --cpu --grid tiny1m \
	    --seg_depth 2 --steps 1500 --width_mult 0.25 --out BENCH_TABLE_SEG.md

# Production-geometry tables (TPU): det with convergence milestones +
# saved per-mode weights, then tracking over those weights, then seg.
bench_table_full:
	python -m v2x_sim_tpu.tools.bench_table --grid full --steps 12000 \
	    --batch 8 --agents 6 --data_pool 600 --cosine \
	    --eval_at 1500,3000,6000 --eval_batches 12 \
	    --modes lowerbound,max,when2com,disco,upperbound,disco+kd,v2v \
	    --save_states runs/table_states_full --out BENCH_TABLE_FULL.md
bench_table_full_seeds:
	python -m v2x_sim_tpu.tools.bench_table_merge \
	    --curves BENCH_TABLE_FULL_curves.jsonl,BENCH_TABLE_FULL_SEED1_curves.jsonl \
	    --out BENCH_TABLE_FULL_SEEDS.md
bench_table_track:
	python -m v2x_sim_tpu.tools.bench_table_track \
	    --states runs/table_states_full --grid full --agents 6 \
	    --seqs 6 --frames 20 --out BENCH_TABLE_TRACK.md
bench_table_seg_full:
	python -m v2x_sim_tpu.tools.bench_table --task seg --grid full \
	    --seg_depth 4 --steps 2500 --batch 8 --agents 6 --data_pool 300 \
	    --cosine --out BENCH_TABLE_SEG_FULL.md
diag_v2v:
	python -m v2x_sim_tpu.tools.diag_v2v --grid full --agents 6 \
	    --steps 600 --probe_every 100
