"""TPU Pallas kernels: the device tier of the framework.

The reference's device tier is five GLSL fragment shaders (reference
shader/*.fs); here it is Mosaic TPU kernels operating on VMEM-resident
scene tables.
"""
