from .jacobi_pallas import solve_jacobi_pallas, vmem_fits

__all__ = ["solve_jacobi_pallas", "vmem_fits"]
