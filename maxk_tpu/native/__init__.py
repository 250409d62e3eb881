"""Native (C++) runtime components, exposed to Python via ctypes.

The reference implements its runtime layer in C++/CUDA (kernel harness,
binding extensions — reference kernels/*.h, cuda_kernel_bindings.cpp);
here the TPU compute path is JAX/XLA and the host-side hot loops (tile
packing at graph load) are C++, compiled on first use with the system
toolchain (no pybind11 in this image; plain C ABI + ctypes).
"""
