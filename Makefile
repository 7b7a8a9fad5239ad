# Common developer targets (see CLAUDE.md for environment notes)
.PHONY: test bench demo dryrun native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:
	g++ -O3 -std=c++17 -shared -fPIC spann3r_tpu/native/geomlib.cpp \
	    -o spann3r_tpu/native/libgeomlib.so

demo:
	python demo.py --demo_path $(SCENE) --save_path ./output/demo
