classdef OGLBeamformerShaderKind < int32
	enumeration
		Decode (0)
		Filter (1)
		Demodulate (2)
		DAS (3)
		Sum (4)
		MinMax (5)
		Hilbert (6)
		CoherencyWeighting (7)
		Reshape (8)
		RenderBeamformed (9)
	end
end