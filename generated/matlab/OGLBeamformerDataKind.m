classdef OGLBeamformerDataKind < int32
	enumeration
		Int16 (0)
		Int16Complex (1)
		Float32 (2)
		Float32Complex (3)
		Float16 (4)
		Float16Complex (5)
	end
end