from drake_ddp_tpu.contact.geometry import (
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    build_contact_model,
)
from drake_ddp_tpu.contact.forces import contact_forces

__all__ = [
    "CollisionGeometry",
    "ContactProps",
    "GeometrySet",
    "build_contact_model",
    "contact_forces",
]
