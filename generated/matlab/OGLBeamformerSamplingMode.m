classdef OGLBeamformerSamplingMode < int32
	enumeration
		x2X (0)
		x4X (1)
	end
end