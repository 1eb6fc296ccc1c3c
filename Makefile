.PHONY: test test-fast bench native clean smoke

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not e2e and not scst and not supervis"

bench:
	python bench.py

native:
	$(MAKE) -C native

smoke:
	python train.py --dataset synthetic --batch_size 32 --num_props 16 \
	  --seq_length 14 --rnn_size 128 --input_encoding_size 64 \
	  --att_hid_size 64 --max_epochs 2 --checkpoint_path /tmp/cvc_smoke \
	  --losses_log_every 4 --beam_size 1

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
