"""Scene/asset model: glTF ingest, materials, textures, camera."""
