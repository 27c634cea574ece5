# Dataset bootstrap targets (parity with the reference Makefile's
# squad-bootstrap, `/root/reference/Makefile:1-4`) plus MNIST and the BERT
# vocab for the native tokenizer. Requires network access.

DATASET := dataset

squad-bootstrap:
	mkdir -p $(DATASET)/squadv1
	wget -nc -P $(DATASET)/squadv1 https://rajpurkar.github.io/SQuAD-explorer/dataset/train-v1.1.json
	wget -nc -P $(DATASET)/squadv1 https://rajpurkar.github.io/SQuAD-explorer/dataset/dev-v1.1.json

mnist-bootstrap:
	mkdir -p $(DATASET)/mnist
	for f in train-images-idx3-ubyte train-labels-idx1-ubyte t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do \
		wget -nc -P $(DATASET)/mnist https://storage.googleapis.com/cvdf-datasets/mnist/$$f.gz; \
	done

vocab-bootstrap:
	mkdir -p $(DATASET)
	wget -nc -O $(DATASET)/bert-base-uncased-vocab.txt \
		https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt

gpt2-bootstrap:
	mkdir -p $(DATASET)/gpt2
	wget -nc -P $(DATASET)/gpt2 https://huggingface.co/gpt2/resolve/main/vocab.json
	wget -nc -P $(DATASET)/gpt2 https://huggingface.co/gpt2/resolve/main/merges.txt

native:
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
		bayeformers_tpu/native/wordpiece.cc -o bayeformers_tpu/native/libwordpiece.so
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
		bayeformers_tpu/native/bpe.cc -o bayeformers_tpu/native/libbpe.so
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
		bayeformers_tpu/native/unigram.cc -o bayeformers_tpu/native/libunigram.so

test:
	python -m pytest tests/ -m "not slow" -q

test-full:
	python -m pytest tests/ -q

test-tpu:
	BAYEFORMERS_TEST_TPU=1 python -m pytest tests/test_ops_tpu.py -q

bench:
	python bench.py

# (Re)generate the committed jax.export program blobs (bench_exports/) and
# warm the persistent XLA compile cache for every bench leg — run on the
# real chip after any change that alters a traced bench program.
bench-warm:
	python bench.py --warm

# Snapshot the current .jax_cache into the COMMITTED seed directory so the
# driver's fresh-from-git bench run compiles warm (bench.py restores the
# seed by hardlink at startup). Run after bench-warm / a full bench pass.
# The micro stage's scanned-op programs (jit_run-*) are excluded: ~380 MB
# of entries that save only ~81 s of backend compile — micro runs last and
# compiles comfortably inside its stage timeout when cold.
bench-seed:
	rm -rf bench_exports/cache_seed
	mkdir -p bench_exports/cache_seed
	cd .jax_cache && for f in *-cache; do \
		case $$f in jit_run-*) ;; *) \
			ln $$f ../bench_exports/cache_seed/$$f 2>/dev/null || \
			cp $$f ../bench_exports/cache_seed/$$f ;; esac; done
	du -sh bench_exports/cache_seed

# Snapshot the CPU-gate compile cache into the COMMITTED seed directory so
# a fresh-from-git `make test` starts part-warm (restored by conftest.py).
# Run after a green full gate on the current tree.
test-seed:
	rm -rf tests/cache_seed
	mkdir -p tests/cache_seed
	cp -l .jax_cache_cpu/*-cache tests/cache_seed/ 2>/dev/null || \
		cp .jax_cache_cpu/*-cache tests/cache_seed/
	du -sh tests/cache_seed

.PHONY: squad-bootstrap mnist-bootstrap vocab-bootstrap gpt2-bootstrap native test test-full test-tpu bench bench-warm bench-seed test-seed
